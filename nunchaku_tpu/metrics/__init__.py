from .lpips import LPIPS, compute_lpips

__all__ = ["LPIPS", "compute_lpips"]
