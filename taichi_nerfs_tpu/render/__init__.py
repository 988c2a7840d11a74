from .renderer import render_image, render_test_chunk, render_train  # noqa: F401
