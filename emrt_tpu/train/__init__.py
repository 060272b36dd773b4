from .state import TrainState, create_train_state, num_params
from .step import make_eval_step, make_forward, make_train_step
