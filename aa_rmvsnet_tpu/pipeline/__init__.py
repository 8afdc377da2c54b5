"""Drivers: training, inference (depth-map generation), and fusion."""
