from .checkpoint import CheckpointManager
from .loop import Trainer, dummy_batch, stack_micro_batches, train_from_config
from .preemption import PreemptionGuard
from .losses import contrastive_loss, total_loss, weighted_bce_with_logits
from .optimizer import (label_param, make_optimizer, merge_params,
                        param_labels, split_trainable)
from .step import (TrainState, init_model_variables,
                   make_bn_recalibration_step, make_eval_step,
                   make_train_step)

__all__ = [
    "CheckpointManager", "Trainer", "dummy_batch", "stack_micro_batches",
    "train_from_config", "contrastive_loss", "total_loss",
    "weighted_bce_with_logits", "label_param", "make_optimizer",
    "merge_params", "param_labels", "split_trainable", "TrainState",
    "init_model_variables", "make_bn_recalibration_step", "make_eval_step",
    "make_train_step", "PreemptionGuard",
]
