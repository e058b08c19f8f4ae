"""Flax model zoo: VGG-pyramid towers, RPN, AVOD, DT (pair), Stack."""
