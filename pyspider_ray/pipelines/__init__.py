from .crawl import CrawlPipeline, CrawlConfig

__all__ = ["CrawlPipeline", "CrawlConfig"]
