from ppmstereo_tpu.data.datasets import (
    DynamicReplicaDataset,
    SequenceSceneFlowDataset,
    SequenceSintelStereo,
    SyntheticStereoDataset,
    fetch_dataloader,
)
from ppmstereo_tpu.data.loader import PrefetchLoader
