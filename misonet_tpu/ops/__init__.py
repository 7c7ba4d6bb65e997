from misonet_tpu.ops.stft import (
    hann_periodic,
    stft,
    istft,
    stft_scaled,
    istft_scaled,
)
from misonet_tpu.ops.chunk import split_chunks, merge_chunks, train_chunks
