"""Remote-source orchestration (sources/remote.py) with scripted fake
transports — the full control flow of the reference's Overpass fetch
error sniffing (sources.py:316-321) and Galaxy retry/poll loop
(sources.py:655-717), no network."""

import json

import pytest

from osm_export_tool_python_spark.sources.remote import (
    GalaxyClient,
    GalaxyTaskFailure,
    OverpassClient,
    OverpassFailure,
)


class ScriptedTransport:
    """Returns queued (status, body) responses and records requests."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []

    def __call__(self, method, url, data=None, headers=None):
        self.calls.append((method, url, data, headers))
        return self.responses.pop(0)


GOOD_OSM = b"\n".join(
    [b'<?xml version="1.0"?>', b"<osm>", b"<meta/>", b"<node/>", b"<way/>", b"<relation/>"]
)


def test_overpass_success_and_request_shape():
    t = ScriptedTransport([(200, GOOD_OSM)])
    out = OverpassClient("https://overpass.example", transport=t).fetch("[out:xml];...")
    assert out == GOOD_OSM
    method, url, data, _ = t.calls[0]
    assert (method, url) == ("POST", "https://overpass.example/api/interpreter")
    assert data == "[out:xml];..."


def test_overpass_html_error_page_sniffed():
    html = b"\n".join([b"<html>", b"<!DOCTYPE html>", b"", b"", b"", b""])
    t = ScriptedTransport([(200, html)])
    with pytest.raises(OverpassFailure, match="Overpass failure"):
        OverpassClient("https://x", transport=t).fetch("q")


def test_overpass_remark_line_surfaced():
    body = b"\n".join(
        [b"<?xml?>", b"<osm>", b"<meta/>", b"", b"",
         b'<remark>runtime error: Query timed out</remark>']
    )
    t = ScriptedTransport([(200, body)])
    with pytest.raises(OverpassFailure, match="Query timed out"):
        OverpassClient("https://x", transport=t).fetch("q")


def test_overpass_http_error():
    t = ScriptedTransport([(504, b"gateway timeout")])
    with pytest.raises(OverpassFailure, match="HTTP 504"):
        OverpassClient("https://x", transport=t).fetch("q")


def _snapshot_ok(track="/tasks/abc"):
    return (200, json.dumps({"track_link": track}).encode())


def test_galaxy_full_poll_loop():
    sleeps = []
    t = ScriptedTransport(
        [
            (429, b""),                                   # rate limited once
            _snapshot_ok(),                               # then accepted
            (200, json.dumps({"status": "PENDING"}).encode()),
            (200, json.dumps({"status": "STARTED"}).encode()),
            (200, json.dumps({"status": "SUCCESS",
                              "result": {"download_url": "https://d/x.zip"}}).encode()),
        ]
    )
    c = GalaxyClient(
        "https://api.example", transport=t, access_token="tok",
        retry_delay=60, sleep=sleeps.append,
    )
    res = c.snapshot({"fileName": "f", "geometry": {}, "outputType": "geojson"})
    assert res == {"download_url": "https://d/x.zip"}
    # rate-limit retry slept the configured delay; polling slept 2s twice
    assert sleeps == [60, 2, 2]
    # request shape: POST v1/snapshot/ with token header + uuid=false
    method, url, data, headers = t.calls[1]
    assert (method, url) == ("POST", "https://api.example/v1/snapshot/")
    assert headers["access-token"] == "tok"
    assert json.loads(data)["uuid"] == "false"
    # poll hits hostname + v1 + track_link
    assert t.calls[2][1] == "https://api.example/v1/tasks/abc"


def test_galaxy_422_message_extracted():
    t = ScriptedTransport(
        [(422, json.dumps({"detail": [{"msg": "geometry too large"}]}).encode())]
    )
    with pytest.raises(ValueError, match="Error 422: geometry too large"):
        GalaxyClient("https://x", transport=t, sleep=lambda s: None).snapshot({})


def test_galaxy_422_unparseable_body():
    t = ScriptedTransport([(422, b"not json")])
    with pytest.raises(ValueError, match="Unknown error occurred"):
        GalaxyClient("https://x", transport=t, sleep=lambda s: None).snapshot({})


def test_galaxy_rate_limit_exhaustion():
    t = ScriptedTransport([(429, b"")] * 3)
    with pytest.raises(GalaxyTaskFailure, match="rate-limited on all 3"):
        GalaxyClient(
            "https://x", transport=t, max_retries=3, sleep=lambda s: None
        ).snapshot({})


def test_galaxy_task_failure():
    t = ScriptedTransport(
        [_snapshot_ok(), (200, json.dumps({"status": "FAILURE"}).encode())]
    )
    with pytest.raises(GalaxyTaskFailure, match="Task failed from raw data api"):
        GalaxyClient("https://x", transport=t, sleep=lambda s: None).snapshot({})


def test_galaxy_poll_budget_exhausted():
    """A task stuck in PENDING must fail loudly after max_polls, not
    hang the driver forever."""
    t = ScriptedTransport(
        [_snapshot_ok()] + [(200, json.dumps({"status": "PENDING"}).encode())] * 4
    )
    with pytest.raises(GalaxyTaskFailure, match="not finished after 4 polls"):
        GalaxyClient(
            "https://x", transport=t, max_polls=4, sleep=lambda s: None
        ).snapshot({})
