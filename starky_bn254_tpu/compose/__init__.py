"""Batch composition: offset chaining for MSM / multi-exponentiation."""

from .msm import (
    Fq12MultiExp,
    G1Msm,
    G2Msm,
    g2_mul_by_cofactor_input,
    pad_instances,
)

__all__ = [
    "G1Msm",
    "G2Msm",
    "Fq12MultiExp",
    "g2_mul_by_cofactor_input",
    "pad_instances",
]
