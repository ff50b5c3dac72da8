from . import asof, dedup, iterate, multimodal, similarity, sort, temporal, text  # noqa: F401
