from .losses import NeRFLossConfig, nerf_loss
from .metrics import psnr, mse
from .trainer import TrainConfig, NeRFTrainer
