"""Arrow-batched pandas UDFs over the texthash primitives.

The Spark-side fast path for the dedup/fingerprint family: Spark
evaluates higher-order lambda functions interpreted (no whole-stage
codegen), which measured 2-4s per query at sf0.1; these UDFs compute
the identical modular-integer arithmetic via texthash.np_* (exact in
any evaluation order — parity with the DuckDB oracle is unaffected)
vectorized across each Arrow batch.

Scale: embarrassingly parallel over batches, no state, no shuffle;
batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ziggurat_spark.functions import texthash as TH


def fingerprint_udf():
    @F.pandas_udf("bigint")
    def fp(text: pd.Series) -> pd.Series:
        return pd.Series(TH.np_char_fingerprints(list(text)), dtype="object")

    return fp


def simhash_udf():
    @F.pandas_udf("bigint")
    def sim(text: pd.Series) -> pd.Series:
        whs = TH.np_word_hashes(list(text))
        return pd.Series(
            [None if w is None else TH.np_simhash32(w) for w in whs],
            dtype="object",
        )

    return sim


def shingles_udf(k: int):
    @F.pandas_udf("array<bigint>")
    def sh(text: pd.Series) -> pd.Series:
        whs = TH.np_word_hashes(list(text))
        return pd.Series(
            [
                None if w is None else TH.np_shingle_hashes(w, k).tolist()
                for w in whs
            ]
        )

    return sh


def minhash_sig_udf(k: int):
    @F.pandas_udf("array<bigint>")
    def sig(text: pd.Series) -> pd.Series:
        whs = TH.np_word_hashes(list(text))
        out = []
        for w in whs:
            if w is None:
                out.append(None)
                continue
            s = TH.np_minhash_signature(TH.np_shingle_hashes(w, k))
            out.append(None if s is None else s.tolist())
        return pd.Series(out)

    return sig


def lsh_buckets_udf(k: int, bands: int, rows_per_band: int):
    """Per-document LSH bucket keys: band b's key mixes its
    ``rows_per_band`` signature rows as ``(mh0*C1 + mh1) % P``
    (texthash.C1 chaining, same as the oracle's band key)."""

    @F.pandas_udf("array<bigint>")
    def buckets(text: pd.Series) -> pd.Series:
        whs = TH.np_word_hashes(list(text))
        out = []
        for w in whs:
            if w is None:
                out.append(None)
                continue
            s = TH.np_minhash_signature(TH.np_shingle_hashes(w, k))
            if s is None:
                out.append(None)
                continue
            bks = []
            for b in range(bands):
                key = 0
                for t in range(rows_per_band):
                    key = (key * TH.C1 + int(s[b * rows_per_band + t])) % TH.P
                bks.append(key)
            out.append(bks)
        return pd.Series(out)

    return buckets
