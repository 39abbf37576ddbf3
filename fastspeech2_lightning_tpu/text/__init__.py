from .processor import TextProcessor, PAD_SYMBOL, HARDCODED_INITIAL_SYMBOLS
from .lookups import LookupTable, lookuptables_from_config, build_lookup

__all__ = [
    "TextProcessor",
    "PAD_SYMBOL",
    "HARDCODED_INITIAL_SYMBOLS",
    "LookupTable",
    "lookuptables_from_config",
    "build_lookup",
]
