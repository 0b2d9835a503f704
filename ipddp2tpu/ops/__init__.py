from .ldlt import LDLTFactors, ldlt_factor, ldlt_solve, kkt_factor_and_inertia

__all__ = ["LDLTFactors", "ldlt_factor", "ldlt_solve", "kkt_factor_and_inertia"]
