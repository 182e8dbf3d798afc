"""Visualization: headless episode rendering + debug reward dashboards.

Replaces the reference's Isaac Gym viewer (vec_task.py:197-224) and live
matplotlib reward plots (kick_env.py:230-238, :586-722) with
headless-friendly equivalents (Agg backend; writes PNG/GIF/MP4).
"""
