"""Pallas TPU kernels — the framework's native compute components.

The reference delegates its hot math to stock torch ops (SURVEY §2.11);
here the equivalents are custom TPU kernels (fused gather/score/loss,
fused score+top-k). Populated incrementally; every kernel has a pure-XLA
reference implementation it is tested against.
"""
