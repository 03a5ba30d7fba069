"""Remote-source I/O orchestration: Overpass fetch + error sniffing
and the Galaxy (raw-data API) POST → retry → poll → result loop.

These are the network client shells around the already-ported filter
compilers (functions/pushdown.py): reference `Overpass.fetch`
(sources.py:251-335) and `Galaxy.fetch_rawdata` (sources.py:543-876).
The transport is INJECTED (any callable `(method, url, data, headers)
-> (status_code, body_bytes)`), so the full control flow — rate-limit
retry, 422 message extraction, failure sniffing, the PENDING→SUCCESS
poll loop — is offline-testable; `urllib_transport` provides a
stdlib-only real transport for live use (no `requests` dependency).

Scale note: these clients run on the DRIVER before the Spark job (the
reference runs them before osmium conversion): they produce the input
artifact/URL that the distributed pipeline then reads.  Retry/poll
state is plain data, so a resumable job can persist it in the export
manifest alongside the per-partition lineage.
"""

from __future__ import annotations

import json
import time


class OverpassFailure(Exception):
    pass


class GalaxyTaskFailure(Exception):
    pass


def urllib_transport(method, url, data=None, headers=None):
    """Stdlib transport: returns (status_code, body_bytes).  Only used
    for live requests; every test injects a fake."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url,
        data=data.encode() if isinstance(data, str) else data,
        headers=headers or {},
        method=method,
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


class OverpassClient:
    """POST an Overpass QL body and sniff the two failure shapes the
    reference checks for (sources.py:316-321): an HTML error page
    (line 2 contains 'DOCTYPE html') and a `remark` element on line 6
    (Overpass writes runtime errors as remarks in otherwise-valid
    XML).  The QL body itself comes from the ported compiler
    (functions/pushdown.py:Overpass.query)."""

    def __init__(self, hostname, transport=urllib_transport):
        self.hostname = hostname.rstrip("/")
        self.transport = transport

    def fetch(self, ql_body: str) -> bytes:
        status, body = self.transport(
            "POST", self.hostname + "/api/interpreter", data=ql_body
        )
        if status != 200:
            raise OverpassFailure("Overpass HTTP %d" % status)
        lines = body.split(b"\n")[:6]
        if len(lines) > 1 and b"DOCTYPE html" in lines[1]:
            raise OverpassFailure("Overpass failure")
        if len(lines) > 5 and b"remark" in lines[5]:
            raise OverpassFailure(lines[5].decode("utf-8", "replace"))
        return body


class GalaxyClient:
    """The raw-data-API orchestration loop (reference
    sources.py:655-717, 837-876): POST the snapshot request with
    rate-limit retries, then poll `track_link` until SUCCESS/FAILURE.

    429 → sleep(retry_delay), retry up to max_retries;
    422 → surface `detail[0].msg` from the response JSON;
    other non-200 → raise;
    poll: FAILURE → raise, SUCCESS → return `result`, else sleep(2).
    """

    def __init__(
        self,
        hostname,
        transport=urllib_transport,
        access_token=None,
        max_retries=5,
        retry_delay=60,
        max_polls=1800,
        sleep=time.sleep,
    ):
        self.hostname = hostname if hostname.endswith("/") else hostname + "/"
        self.transport = transport
        self.access_token = access_token
        self.max_retries = max_retries
        self.retry_delay = retry_delay
        self.max_polls = max_polls  # × 2 s sleep ⇒ default 1 h ceiling
        self.sleep = sleep

    def _headers(self):
        h = {"accept": "application/json", "Content-Type": "application/json"}
        if self.access_token:
            h["access-token"] = self.access_token
        return h

    def snapshot(self, request_body: dict) -> dict:
        """POST the request (as built by pushdown.Galaxy backends) and
        block until the remote task completes; returns the `result`
        payload (download URL etc.)."""
        body = dict(request_body)
        body["uuid"] = "false"  # reference sources.py:659
        status = body_bytes = None
        for _ in range(self.max_retries):
            status, body_bytes = self.transport(
                "POST",
                self.hostname + "v1/snapshot/",
                data=json.dumps(body),
                headers=self._headers(),
            )
            if status == 429:
                self.sleep(self.retry_delay)
                continue
            if status == 422:
                try:
                    msg = json.loads(body_bytes)["detail"][0]["msg"]
                except (json.JSONDecodeError, KeyError, IndexError, TypeError):
                    msg = "Unknown error occurred"
                raise ValueError("Error 422: %s" % msg)
            if status != 200:
                raise GalaxyTaskFailure("HTTP %d from snapshot API" % status)
            break
        else:
            raise GalaxyTaskFailure(
                "rate-limited on all %d attempts" % self.max_retries
            )

        res = json.loads(body_bytes)
        track_url = "%sv1%s" % (self.hostname, res["track_link"])
        for _ in range(self.max_polls):
            status, body_bytes = self.transport("GET", track_url)
            if status != 200:
                raise GalaxyTaskFailure("HTTP %d from track API" % status)
            res = json.loads(body_bytes)
            if res.get("status") == "FAILURE":
                raise GalaxyTaskFailure("Task failed from raw data api")
            if res.get("status") == "SUCCESS":
                return res["result"]
            self.sleep(2)
        # a stuck PENDING task (or an API that grew a new status value)
        # must hang the driver loudly, not forever
        raise GalaxyTaskFailure(
            "task not finished after %d polls (last status %r)"
            % (self.max_polls, res.get("status"))
        )
