from .loss import compute_loss
from .state import TrainState, create_train_state, noam_schedule

__all__ = ["compute_loss", "TrainState", "create_train_state", "noam_schedule"]
