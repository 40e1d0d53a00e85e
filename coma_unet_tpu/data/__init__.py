from coma_unet_tpu.data.lookup import (  # noqa: F401
    extract_id,
    get_id_from_path,
    load_lookup_csv,
    filter_for_holdout,
    create_splits_lookup_tables,
)
from coma_unet_tpu.data.covariates import CovariateTable, PredictionTable  # noqa: F401
from coma_unet_tpu.data.datasets import (  # noqa: F401
    VolumeDataset,
    CovariateVolumeDataset,
    ContrastiveVolumeDataset,
    ClusterVolumeDataset,
    RegressionVolumeDataset,
    PredictedMetaTauDataset,
    CombinedVolumeDataset,
    A4VolumeDataset,
    InferenceVolumeDataset,
    CustomSampler,
)
from coma_unet_tpu.data.pipeline import DataLoader, collate  # noqa: F401
