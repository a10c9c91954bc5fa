import os

import pytest

REFERENCE_PAGES = "/root/reference/test-pages"


def load_page(name: str) -> str:
    with open(os.path.join(REFERENCE_PAGES, name), encoding="utf-8") as f:
        return f.read()


@pytest.fixture(scope="session")
def page_html() -> str:
    return load_page("page.html")


@pytest.fixture(scope="session")
def page2_html() -> str:
    return load_page("page2.html")


@pytest.fixture(scope="session")
def rustwiki_html() -> str:
    return load_page("rustwiki.html")


@pytest.fixture(scope="session")
def hacker_news_html() -> str:
    return load_page("hacker_news.html")


@pytest.fixture(scope="session")
def wisburg_html() -> str:
    return load_page("wisburg.html")
