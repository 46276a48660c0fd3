"""map_batches stage bodies for the crawl pipeline."""
