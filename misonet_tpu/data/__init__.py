from misonet_tpu.data.dataset import ShardDataset, Batcher
from misonet_tpu.data.synthetic import synth_mixture, synth_shard_dir
