"""API-surface parity with the reference `python/pathway` package.

Every name the reference exports from its public `__init__.py` files
must resolve on `pathway_spark` under the same path — this is the
"a user of the reference could switch repos" contract, checked name by
name. (Functional behavior is covered by the operator suites; this
guards the import surface.)
"""

from __future__ import annotations

import pathway_spark as pw

TOP_LEVEL = [
    "AsofJoinResult", "AsyncTransformer", "BaseCustomAccumulator",
    "ColumnExpression", "ColumnReference", "DateTimeNaive", "DateTimeUtc",
    "Duration", "GroupedJoinResult", "GroupedTable", "IntervalJoinResult",
    "JoinMode", "JoinResult", "Joinable", "Json", "LiveTable",
    "MonitoringLevel", "OuterJoinResult", "PersistenceMode", "Pointer",
    "PyObjectWrapper", "Schema", "SchemaProperties", "Table", "TableLike",
    "TableSlice", "Type", "UDF", "WindowJoinResult", "__version__", "apply",
    "apply_async", "apply_with_type", "assert_table_has_schema",
    "asynchronous", "cast", "coalesce", "column_definition", "debug",
    "declare_type", "demo", "enable_interactive_mode", "fill_error",
    "global_error_log", "graphs", "groupby", "if_else", "indexing", "io",
    "iterate", "iterate_universe", "join", "join_inner", "join_left",
    "join_outer", "join_right", "left", "load_yaml", "local_error_log",
    "make_tuple", "ml", "pandas_transformer", "persistence", "reducers",
    "require", "right", "run", "run_all", "schema_builder",
    "schema_from_csv", "schema_from_dict", "schema_from_types",
    "set_license_key", "set_monitoring_config", "sql", "stateful",
    "statistical", "table_transformer", "temporal", "this", "udf", "udfs",
    "universes", "unwrap", "utils", "viz", "window", "wrap_py_object",
]

IO = [
    "CsvParserSettings", "SynchronizedColumn", "TLSSettings", "airbyte",
    "bigquery", "chroma", "clickhouse", "csv", "debezium", "deltalake",
    "duckdb", "dynamodb", "elasticsearch", "fs", "gdrive", "http",
    "iceberg", "jsonlines", "kafka", "kinesis", "leann", "logstash",
    "milvus", "minio", "mongodb", "mqtt", "mssql", "mysql", "nats", "null",
    "pinecone", "plaintext", "postgres", "pubsub", "pyfilesystem",
    "python", "qdrant", "questdb", "rabbitmq", "redpanda",
    "register_input_synchronization_group", "s3", "slack", "sqlite",
    "subscribe", "weaviate",
]

TEMPORAL = [
    "AsofJoinResult", "AsofNowJoinResult", "CommonBehavior", "Direction",
    "ExactlyOnceBehavior", "Interval", "IntervalJoinResult", "Window",
    "WindowJoinResult", "add_update_timestamp_utc", "asof_join",
    "asof_join_left", "asof_join_outer", "asof_join_right", "asof_now_join",
    "asof_now_join_inner", "asof_now_join_left", "common_behavior",
    "exactly_once_behavior", "inactivity_detection", "interval",
    "interval_join", "interval_join_inner", "interval_join_left",
    "interval_join_outer", "interval_join_right", "intervals_over",
    "session", "sliding", "tumbling", "utc_now", "window_join",
    "window_join_inner", "window_join_left", "window_join_outer",
    "window_join_right", "windowby",
]

INDEXING = [
    "AbstractRetrieverFactory", "BruteForceKnn", "BruteForceKnnFactory",
    "BruteForceKnnMetricKind", "DataIndex", "DefaultKnnFactory",
    "HybridIndex", "HybridIndexFactory", "InnerIndex", "LshKnn",
    "LshKnnFactory", "TantivyBM25", "TantivyBM25Factory", "USearchKnn",
    "USearchMetricKind", "UsearchKnnFactory",
    "default_brute_force_knn_document_index",
    "default_full_text_document_index", "default_lsh_knn_document_index",
    "default_usearch_knn_document_index", "default_vector_document_index",
]

GRAPHS = ["Edge", "Graph", "Vertex", "WeightedGraph", "bellman_ford",
          "louvain_communities", "pagerank"]

ML = ["classifiers", "datasets", "hmm", "smart_table_ops", "utils"]

ML_CLASSIFIERS = [
    "DistanceTypes", "knn_lsh_classifier_train", "knn_lsh_classify",
    "knn_lsh_euclidean_classifier_train", "knn_lsh_generic_classifier_train",
    "knn_lsh_train",
]

ML_SMART_TABLE_OPS = [
    "Edge", "Feature", "FuzzyJoinFeatureGeneration", "FuzzyJoinNormalization",
    "JoinResult", "Node", "fuzzy_match", "fuzzy_match_tables",
    "fuzzy_match_with_hint", "fuzzy_self_match", "smart_fuzzy_match",
]

UTILS = ["async_transformer", "bucketing", "col", "filtering",
         "pandas_transformer"]

UTILS_COL = ["unpack_col", "unpack_col_dict", "apply_all_rows",
             "multiapply_all_rows", "groupby_reduce_majority"]

UTILS_FILTERING = ["argmax_rows", "argmin_rows"]

XPACK_LLM = [
    "Doc", "DocTransformer", "DocTransformerCallable", "document_store",
    "embedders", "llms", "parsers", "prompts", "question_answering",
    "rerankers", "servers", "splitters", "vector_store",
]

DT_METHODS = [
    "nanosecond", "microsecond", "millisecond", "second", "minute", "hour",
    "day", "month", "year", "week", "weekday", "timestamp", "strftime",
    "strptime", "to_utc", "to_naive_in_timezone", "add_duration_in_timezone",
    "subtract_duration_in_timezone", "subtract_date_time_in_timezone",
    "to_duration", "round", "floor", "nanoseconds", "microseconds",
    "milliseconds", "seconds", "minutes", "hours", "days", "weeks",
    "from_timestamp", "utc_from_timestamp",
]

ORDERED = ["diff"]
STATISTICAL = ["interpolate"]


def _check(obj, names, where):
    missing = [n for n in names if not hasattr(obj, n)]
    assert not missing, f"{where} missing: {missing}"


TABLE_METHODS = [
    "C", "buffer", "concat", "concat_reindex", "copy", "debug",
    "deduplicate", "difference", "empty", "eval_type", "filter",
    "filter_out_results_of_forgetting", "flatten", "forget",
    "from_columns", "from_streams", "groupby", "having", "ignore_late",
    "intersect", "is_append_only", "ix", "ix_ref", "join", "join_inner",
    "join_left", "join_outer", "join_right", "keys", "live",
    "pointer_from", "reduce", "rename", "restrict", "select", "slice",
    "sort", "split", "to", "to_stream", "typehints", "unpack_snapshots",
    "update_cells", "update_id_type", "update_rows", "update_types",
    "with_columns", "with_id", "with_id_from",
    "with_prefix", "with_suffix", "with_universe_of", "without",
    "windowby", "asof_join", "asof_now_join", "interval_join",
    "window_join",
]


def test_top_level():
    _check(pw, TOP_LEVEL, "pathway_spark")


def test_table_methods():
    _check(pw.Table, TABLE_METHODS, "pw.Table")


def test_io():
    _check(pw.io, IO, "pw.io")


def test_temporal():
    _check(pw.temporal, TEMPORAL, "pw.temporal")


def test_indexing():
    _check(pw.indexing, INDEXING, "pw.indexing")


def test_graphs():
    _check(pw.graphs, GRAPHS, "pw.graphs")


def test_ml():
    _check(pw.ml, ML, "pw.ml")
    _check(pw.ml.classifiers, ML_CLASSIFIERS, "pw.ml.classifiers")
    _check(pw.ml.smart_table_ops, ML_SMART_TABLE_OPS, "pw.ml.smart_table_ops")
    assert hasattr(pw.ml.hmm, "create_hmm_reducer")
    assert hasattr(pw.ml.utils, "classifier_accuracy")
    assert hasattr(pw.ml.datasets, "classification")


def test_utils():
    _check(pw.utils, UTILS, "pw.utils")
    _check(pw.utils.col, UTILS_COL, "pw.utils.col")
    _check(pw.utils.filtering, UTILS_FILTERING, "pw.utils.filtering")
    assert hasattr(pw.utils.bucketing, "truncate_to_minutes")


def test_xpack_llm():
    _check(pw.xpacks.llm, XPACK_LLM, "pw.xpacks.llm")


def test_dt_namespace():
    _check(pw.this.x.dt, DT_METHODS, "expr.dt")


def test_ordered_statistical():
    _check(pw.stdlib.ordered, ORDERED, "pw.stdlib.ordered")
    _check(pw.statistical, STATISTICAL, "pw.statistical")


SCHEMA_METHODS = [
    "columns", "column_names", "keys", "typehints", "default_values",
    "with_types", "without", "with_id_type", "update_properties",
    "id_type", "primary_key_columns", "assert_matches_schema",
]


def test_schema_methods():
    _check(pw.Schema, SCHEMA_METHODS, "pw.Schema")
    class S(pw.Schema):
        a: int
        b: str
    assert S.keys() == ["a", "b"]
    assert S.with_types(b=float).typehints()["b"] is float
    assert S.without("a").keys() == ["b"]
