from misonet_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    PlateauScheduler,
)
from misonet_tpu.train.steps import (
    make_separate_train_step,
    make_separate_eval_step,
    make_separate_wave_train_step,
    make_separate_wave_eval_step,
    make_enhance_train_step,
    make_enhance_joint_train_step,
)
