from exstream_implementation_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)

# importing the catalogs populates the registry
from exstream_implementation_spark.plans import (  # noqa: F401,E402
    analytics,
    dedup,
    exstream_sql,
    multimodal,
    relational,
    similarity,
    text,
    windows,
)
