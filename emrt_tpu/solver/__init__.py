from .lr_scheduler import get_scheduler
from .optimizer import get_optimizer, param_labels
