"""Utilities: debug tensor printing (the `help` crate analog)."""
