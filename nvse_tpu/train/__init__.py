from .trainer import (
    GANTrainer,
    TrainStepFns,
    create_states,
    make_optimizer,
    make_train_step,
)
