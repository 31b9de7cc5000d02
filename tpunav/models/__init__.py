"""Robot and sensor models."""

from .cart import CartParams, kinematic_cart  # noqa: F401
