from skinnerdb_spark.functions.exact import davg, dsum, DS, DAVG  # noqa: F401
