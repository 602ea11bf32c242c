from .urls import (build_url, quote_non_ascii, canonical_url, url_host,
                   md5_taskid, urlhash64, curl_to_arguments)

__all__ = ["build_url", "quote_non_ascii", "canonical_url", "url_host",
           "md5_taskid", "urlhash64", "curl_to_arguments"]
