from .evaluate import build_val_transforms, evaluate
from .slide import ms_inference, slide_inference, ss_inference, window_grid
