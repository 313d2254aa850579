"""HTTP frontend parity tests (reference ``Mainpage.java:26-135,370-389``):
routes, error bodies, pagination semantics, and agreement with the
serving DataFrame API."""

import json
import urllib.error
import urllib.request
from urllib.parse import quote

import pytest

from searchengine_spark.corpus import VOCAB


@pytest.fixture(scope="module")
def server_url(spark, tiny_index, tiny_pages_path):
    from searchengine_spark.webserver import start_server

    server, _thread = start_server(spark, tiny_index, tiny_pages_path)
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}"
    server.shutdown()
    server.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as resp:
        return resp.status, resp.read().decode("utf-8")


def test_hello_and_form(server_url):
    status, body = _get(f"{server_url}/hello")
    assert (status, body) == (200, "Hello World!")
    status, body = _get(f"{server_url}/")
    assert status == 200
    assert 'action="/search"' in body and 'name="query"' in body


def test_missing_query_is_400(server_url):
    for path in ("/search", "/search?query=%20%20"):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"{server_url}{path}")
        assert ei.value.code == 400
        assert ei.value.read().decode() == "Query parameter is missing"


def test_no_matches_and_offset_past_end(server_url):
    status, body = _get(f"{server_url}/search?query=zzznotaterm")
    assert (status, body) == (200, "No matched pages found")
    q = quote(VOCAB[0])
    # tiny corpus has far fewer than 10^6 hits
    status, body = _get(f"{server_url}/search?query={q}&offset=1000000")
    assert (status, body) == (200, "")


def test_search_html_matches_serving_api(server_url, spark, tiny_index,
                                         tiny_pages_path):
    from searchengine_spark.serving import search

    q = f"{VOCAB[0]} {VOCAB[1]}"
    expected = search(spark, tiny_index, tiny_pages_path, q, k=5).collect()
    assert expected
    status, body = _get(f"{server_url}/search?query={quote(q)}&limit=5")
    assert status == 200
    # reference formatSearchResults shape: container + one item per hit
    assert body.startswith("<div class='search-results'>")
    assert body.count("<div class='search-result-item'>") == len(expected)
    # rank order preserved: urls appear in blended-score order
    positions = [body.index(f"href='{r['url']}'") for r in expected]
    assert positions == sorted(positions)


def test_json_api_pagination(server_url, spark, tiny_index, tiny_pages_path):
    from searchengine_spark.serving import search

    q = f"{VOCAB[0]} {VOCAB[1]}"
    status, body = _get(
        f"{server_url}/api/search?query={quote(q)}&offset=2&limit=3")
    assert status == 200
    got = json.loads(body)["results"]
    expected = search(
        spark, tiny_index, tiny_pages_path, q, k=3, offset=2
    ).collect()
    assert [(r["rank"], r["url"]) for r in got] == [
        (r["rank"], r["url"]) for r in expected
    ]
    for g, e in zip(got, expected):
        assert g["blended"] == pytest.approx(e["blended"], abs=1e-12)
        assert g["title"] == e["title"] and g["snippet"] == e["snippet"]
