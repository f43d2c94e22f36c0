from tab2neo_spark.kg.canon import canonical_map, connected_components  # noqa: F401
from tab2neo_spark.kg.construct import KGResult, construct_kg  # noqa: F401
