"""Evaluation: KITTI txt writers, AP evaluator drivers."""
