"""Operator library: each module registers named queries into plans.registry."""
