from .flux import (
    FluxIPAdapter,
    ImageProjection,
    ipa_fb_cached_forward,
    ipa_forward,
    load_flux_ip_adapter,
)

__all__ = [
    "FluxIPAdapter",
    "ImageProjection",
    "ipa_fb_cached_forward",
    "ipa_forward",
    "load_flux_ip_adapter",
]
