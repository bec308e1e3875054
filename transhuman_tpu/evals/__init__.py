"""Evaluation: image metrics (PSNR/SSIM/LPIPS) and the eval-loop evaluator."""

from .evaluator import Evaluator  # noqa: F401
from .metrics import mse, psnr, ssim  # noqa: F401
