from .adapt import adapt_batch_stats
from .checkpoint import load_run_params
from .optim import exponential_decay_gamma, make_optimizer
from .state import TrainState, create_train_state
from .trainer import Trainer
from .evaluate import eval_loglike
from .train import train_models, write_history, write_model_summary

__all__ = [
    "adapt_batch_stats",
    "load_run_params",
    "make_optimizer",
    "exponential_decay_gamma",
    "TrainState",
    "create_train_state",
    "Trainer",
    "eval_loglike",
    "train_models",
    "write_history",
    "write_model_summary",
]
