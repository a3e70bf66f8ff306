from exstream_implementation_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)

# importing the catalogs populates the registry.  ORDER MATTERS: the driver's
# correctness harness checks queries in registration order under a bounded
# budget, so the core exstream pipeline and the round-1-unchecked families
# (similarity / text / windows) register before the long-proven relational
# rows.
from exstream_implementation_spark.plans import (  # noqa: F401,E402
    exstream_sql,
    dedup,
    similarity,
    text,
    windows,
    multimodal,
    analytics,
    relational,
)
