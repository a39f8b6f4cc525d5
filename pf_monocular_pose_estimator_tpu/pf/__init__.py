from .propagate import NoiseBounds, propagation_noise_factors, propagate
from .weight import weight_particles
from .resample import stratified_resample
from .refine import gauss_newton_refine

__all__ = [
    "NoiseBounds",
    "propagation_noise_factors",
    "propagate",
    "weight_particles",
    "stratified_resample",
    "gauss_newton_refine",
]
