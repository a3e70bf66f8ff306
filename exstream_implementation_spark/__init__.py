"""exstream_implementation_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of louise-davy/exstream-implementation.

The reference (/root/reference, EXstream: Zhang/Diao/Meliou EDBT 2017) explains
annotated anomalies in multivariate metric streams. This package re-expresses
its full pipeline — interval slicing, correlation clustering, false-positive
filtering, entropy-based single-feature rewards, reward-leap selection,
instability scoring — as lazy, distributed Spark DataFrame plans, plus the
large-scale data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB deployment needs.
"""

__version__ = "0.1.0"

from exstream_implementation_spark.pipeline import (  # noqa: F401,E402
    ExplainConfig,
    explain_anomalies,
    run_config_grid,
)
from exstream_implementation_spark.session import get_spark, tune_session  # noqa: F401,E402
