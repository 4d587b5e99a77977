from .metrics import MetricsLogger, Throughput
from .plotting import plot_epoch_losses, plot_loss_curves, plot_roc

__all__ = ["MetricsLogger", "Throughput", "plot_epoch_losses",
           "plot_loss_curves", "plot_roc"]
