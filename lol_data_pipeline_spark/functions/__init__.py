"""Scalar / text / flatten function catalog (all native Column exprs)."""
