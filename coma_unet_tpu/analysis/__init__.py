from coma_unet_tpu.analysis.embeddings import (  # noqa: F401
    extract_bottleneck_encodings,
    probe_abeta_from_embeddings,
)
from coma_unet_tpu.analysis.regions import (  # noqa: F401
    analyze_region,
    analyze_sample,
    create_roi_suvr_table,
)
from coma_unet_tpu.analysis.attention import export_attention_maps  # noqa: F401
