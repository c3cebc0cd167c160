"""Rendering/compositing: projections, seams, gain, exposure, blending."""
