"""Model registry (mirrors models/__init__.py:3-5 in the reference)."""
from . import matchnerf

models_dict = {
    "matchnerf": matchnerf,
}
