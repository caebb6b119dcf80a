"""Kernel LAB — measured experiments, not the production path.

Variants priced on real TPU live here with their verdicts recorded in
docs/PERF.md; scripts/kbench.py is the only consumer.  Production
traversal is ops/fused.py (via ops/scene_wide.py); nothing in the
renderer imports this package.
"""
