from .optim import get_optimizer, PlateauController  # noqa: F401
from .trainer import TrainState, make_train_step, make_eval_step  # noqa: F401
