"""Host-side data layer: audio IO, corpora, batching, prefetch."""

from titanet_tpu.data.audio_io import read_audio, read_wav, write_wav  # noqa: F401
from titanet_tpu.data.dataset import (  # noqa: F401
    DATASETS,
    ConcatSpeakerDataset,
    LibriSpeechDataset,
    SpeakerDataset,
    Subset,
    SyntheticSpeakerDataset,
    VCTKDataset,
    VoxCelebDataset,
    get_datasets,
)
from titanet_tpu.data.loader import (  # noqa: F401
    Batch,
    ChunkConfig,
    DataLoader,
    NoiseMixConfig,
    ReverbConfig,
    SpeedConfig,
    device_prefetch,
)
