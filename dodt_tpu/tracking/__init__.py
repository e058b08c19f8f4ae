"""Tracking layer: IoU tracker, MoI interpolation, Kalman, MOT eval."""
