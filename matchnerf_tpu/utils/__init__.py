from .containers import DotDict, to_plain_dict
from .logging import log
