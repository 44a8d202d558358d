"""Engine operators: routing, joins, dedup, similarity, text, multimodal."""
