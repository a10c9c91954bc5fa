"""Crawl frontier: URL-seen, politeness, batch rounds, oracle."""
