from .canonicalize import canonicalize_urls, canonicalize_table
from .politeness import PolitenessGate, HostPolicy
from .fetcher import SyntheticFetcher
from .processor import ProcessorStage, ResultBuilder

__all__ = ["canonicalize_urls", "canonicalize_table", "PolitenessGate",
           "HostPolicy", "SyntheticFetcher", "ProcessorStage", "ResultBuilder"]
