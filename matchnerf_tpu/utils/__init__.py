from .containers import DotDict, effective_precision, to_plain_dict
from .logging import log
