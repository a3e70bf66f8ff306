"""Public operator API — the reusable building blocks behind the pipeline and
query catalog."""

from exstream_implementation_spark.operators.bucketing import (  # noqa: F401
    read_bucketed,
    write_bucketed,
)
from exstream_implementation_spark.operators.asof import (  # noqa: F401
    asof_join_backward,
)
from exstream_implementation_spark.operators.components import (  # noqa: F401
    connected_components,
)
from exstream_implementation_spark.operators.correlation import (  # noqa: F401
    correlated_feature_clusters,
    correlated_features_filter,
    correlation_matrix,
)
from exstream_implementation_spark.operators.fp_filter import (  # noqa: F401
    count_matches,
    distance_profile_stats,
    false_positive_filter,
    mass_distance_profile,
)
from exstream_implementation_spark.operators.leap import (  # noqa: F401
    assemble_explanations,
    reward_leap_filter,
)
from exstream_implementation_spark.operators.ann_index import (  # noqa: F401
    append_to_ivf_index,
    build_ivf_index,
    ivf_index_is_stale,
    load_ivf_index,
    probe_ivf_index,
)
from exstream_implementation_spark.operators.multimodal import (  # noqa: F401
    attach_audio_payload,
    attach_gif_payload,
    attach_image_payload,
    audio_stats,
    attach_payload,
    decode_image,
    encode_bmp,
    encode_png,
    decode_png,
    image_stats,
    resize_image,
    decode_wav,
    encode_wav,
    sample_frames,
    sample_gif_frames,
)
from exstream_implementation_spark.operators.gif import (  # noqa: F401
    decode_gif,
    encode_gif,
)
from exstream_implementation_spark.operators.jpeg import (  # noqa: F401
    decode_jpeg,
    encode_jpeg,
)
from exstream_implementation_spark.operators.ranking import (  # noqa: F401
    global_row_number,
    top_k_ranked,
)
from exstream_implementation_spark.operators.rewards import (  # noqa: F401
    AUTO_GROUP_THRESHOLD,
    resolve_segmentation,
    segmentation_entropy,
    segmentation_entropy_stitched,
    single_feature_rewards,
    worst_case_labels,
)
from exstream_implementation_spark.operators.skew import salted_agg  # noqa: F401
from exstream_implementation_spark.operators.slicing import (  # noqa: F401
    melt_features,
    slice_intervals,
)
