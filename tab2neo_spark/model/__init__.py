from tab2neo_spark.model.gazetteer import (  # noqa: F401
    GAZETTEER,
    SAME_AS,
    gazetteer_df,
    gazetteer_sql_values,
    same_as_df,
    same_as_sql_values,
)
from tab2neo_spark.model.metadata import MetadataModel  # noqa: F401
