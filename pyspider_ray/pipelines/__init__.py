from .crawl import CrawlPipeline, CrawlConfig
from .curate import curated_dataset

__all__ = ["CrawlPipeline", "CrawlConfig", "curated_dataset"]
