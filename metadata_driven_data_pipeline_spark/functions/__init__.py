"""Scalar/column function helpers shared by operators (text, vector math)."""
