"""Batch operators. Each module registers queries into the registry."""
