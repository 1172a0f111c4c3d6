"""S10/T5 — HttpTransport against a real local HTTP server.

The reference actually POSTs the chat-completions body and turns HTTP
failures and timeouts into 'ERROR: …' data rows (worker.py:313-344,
120 s timeout, error capture at worker.py:347-355). The wire-format
unit tests (test_llm.py) check the body shape; this module exercises
the executed socket path end to end: 200-with-usage parsing, non-200 →
error row, and a read timeout → error row, plus the usage fold over
the resulting frame.

The server runs in-process (ThreadingHTTPServer on 127.0.0.1:<ephemeral>)
and dispatches on the user-message text so one server serves all cases.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from openrouter_batch_processor_spark.operators.llm import (
    HttpTransport,
    LLMConfig,
    llm_map,
)
from openrouter_batch_processor_spark.operators.aggregates import usage_summary


class _Handler(BaseHTTPRequestHandler):
    # last request body, for wire-format assertions from the test body
    seen: list[dict] = []

    def do_POST(self):  # noqa: N802 (stdlib naming)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).seen.append(
            {"body": body, "auth": self.headers.get("Authorization")}
        )
        user = body["messages"][1]["content"]
        text = user if isinstance(user, str) else user[0]["text"]
        if "FAIL" in text:
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"upstream exploded")
            return
        if "SLOW" in text:
            time.sleep(2.5)  # beyond the client's 1 s read timeout
        reply = {
            "choices": [{"message": {"content": f"echo:{text}"}}],
            "usage": {
                "prompt_tokens": len(text.split()),
                "completion_tokens": 2,
                "total_tokens": len(text.split()) + 2,
                "cost": 0.000003,
            },
        }
        data = json.dumps(reply).encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *args):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def http_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/api/v1/chat/completions"
    srv.shutdown()


def _http_factory(url: str, timeout: float):
    # Defined by value (cloudpickle) so executors need not import tests.
    def factory(config: LLMConfig):
        cfg = LLMConfig(
            system_prompt=config.system_prompt,
            model=config.model,
            reasoning_mode=config.reasoning_mode,
            requests_per_second=config.requests_per_second,
            timeout_seconds=timeout,
        )
        t = HttpTransport(cfg, api_key="sk-test-local")
        t.API_URL = url  # instance override of the class attribute
        return t

    return factory


class TestHttpTransportLive:
    def test_200_parses_content_and_usage(self, http_server):
        cfg = LLMConfig(system_prompt="sys", timeout_seconds=5.0)
        t = HttpTransport(cfg, api_key="sk-test-local")
        t.API_URL = http_server
        r = t.complete("hello wire world")
        assert r["content"] == "echo:hello wire world"
        assert r["prompt_tokens"] == 3
        assert r["completion_tokens"] == 2
        assert r["total_tokens"] == 5
        assert r["cost"] == pytest.approx(0.000003)

    def test_wire_format_on_the_socket(self, http_server):
        _Handler.seen.clear()
        cfg = LLMConfig(
            system_prompt="sys", model="mock/remote", reasoning_mode="true"
        )
        t = HttpTransport(cfg, api_key="sk-test-local")
        t.API_URL = http_server
        t.complete("check format")
        (req,) = _Handler.seen
        assert req["auth"] == "Bearer sk-test-local"
        assert req["body"]["model"] == "mock/remote"
        assert req["body"]["messages"][0] == {"role": "system", "content": "sys"}
        assert req["body"]["reasoning"] == {"enabled": True}

    def test_non_200_raises_http_error(self, http_server):
        from urllib.error import HTTPError

        t = HttpTransport(LLMConfig(), api_key="k")
        t.API_URL = http_server
        with pytest.raises(HTTPError):
            t.complete("please FAIL now")

    def test_llm_map_turns_http_failures_into_rows(self, spark, http_server):
        """The full T5 path: 200, 500 and timeout in one frame —
        failures become ok=False 'ERROR: …' rows, never task failures,
        and the usage fold only counts the successful request."""
        df = spark.createDataFrame(
            [
                ("ok/", "fine request", 1, None),
                ("err/", "FAIL this one", 1, None),
                ("slow/", "SLOW this one", 1, None),
            ],
            "group_id string, prompt string, file_count long, sentinel string",
        ).coalesce(1)
        cfg = LLMConfig(system_prompt="sys")
        out = llm_map(df, cfg, _http_factory(http_server, timeout=1.0))
        rows = {r["file"]: r for r in out.collect()}
        assert rows["ok/"]["ok"] is True
        assert rows["ok/"]["output"] == "echo:fine request"
        assert rows["ok/"]["total_tokens"] == 4
        assert rows["err/"]["ok"] is False
        assert rows["err/"]["output"].startswith("ERROR: ")
        assert "500" in rows["err/"]["output"]
        assert rows["slow/"]["ok"] is False
        assert rows["slow/"]["output"].startswith("ERROR: ")
        assert rows["slow/"]["total_tokens"] == 0

        fold = usage_summary(out).head()
        assert fold["api_requests"] == 3
        assert fold["successful_requests"] == 1
        assert fold["failed_requests"] == 2
        assert fold["total_tokens_sum"] == 4
