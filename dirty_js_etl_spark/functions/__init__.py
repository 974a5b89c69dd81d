from dirty_js_etl_spark.functions.combinators import *  # noqa: F401,F403
