from .graph import NetGraph
from .optim import make_optimizer
from .checkpoint import save_checkpoint, load_checkpoint
from .chunk import run_nn
from .experiment import run_exp, compute_avg_performance
