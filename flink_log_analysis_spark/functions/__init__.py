"""Scalar/column function library shared by operators and plans."""
