from gigapose_tpu.training.state import (
    TrainBatch,
    TrainState,
    OptimConfig,
    create_train_state,
    train_step,
)
