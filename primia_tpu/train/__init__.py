"""Training layer: losses, schedules, optimizers, steps, metrics,
checkpoints, and the epoch driver."""

from primia_tpu.train.checkpoint import (  # noqa: F401
    load_model,
    load_tree,
    save_config_results,
    save_model,
    save_tree,
)
from primia_tpu.train.loop import main  # noqa: F401
from primia_tpu.train.losses import (  # noqa: F401
    calc_class_weights,
    cross_entropy,
    cross_entropy_one_hot,
    mixup,
    to_one_hot,
)
from primia_tpu.train.lr import LearningRateScheduler, make_scheduler  # noqa: F401
from primia_tpu.train.metrics import evaluate_predictions, stats_table  # noqa: F401
from primia_tpu.train.optim import adam, make_optimizer, sgd  # noqa: F401
from primia_tpu.train.steps import (  # noqa: F401
    TrainState,
    build_eval_step,
    build_predict_step,
    build_train_step,
)
