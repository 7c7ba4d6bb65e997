from misonet_tpu.utils.writer import MetricWriter
from misonet_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint,
)
