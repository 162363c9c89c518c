"""Minimal torchvision stand-in (transforms only) for the reference CLI."""
