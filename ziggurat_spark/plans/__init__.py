from ziggurat_spark.plans.quality import (  # noqa: F401
    broadcast_join_count,
    formatted_plan,
    has_cartesian_product,
    pushed_filters,
    scan_read_schemas,
    shuffle_exchange_count,
)
