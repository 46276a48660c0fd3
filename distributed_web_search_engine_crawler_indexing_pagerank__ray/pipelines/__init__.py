"""End-to-end jobs: crawl, index, pagerank, tfidf, query, dedup, ANN."""
