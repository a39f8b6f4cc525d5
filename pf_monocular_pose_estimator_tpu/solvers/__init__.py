from .quartic import solve_quartic
from .p3p import p3p_kneip, p3p_object_to_camera
from .combinatorics import combination_table, permutation_table

__all__ = [
    "solve_quartic",
    "p3p_kneip",
    "p3p_object_to_camera",
    "combination_table",
    "permutation_table",
]
