"""Evaluation harnesses: trajectory tracking, MPC quality."""
