"""S10 — the LLM-inference map operator (the reference's core op).

The reference loops groups sequentially, one HTTPS chat-completion POST
per group, 0.2 s sleep between calls, 120 s timeout, errors captured as
data rows (worker.py:295-355). Distributed shape:

    groups DF -> mapInPandas(llm_map) -> result rows + usage columns

- Transport is pluggable: `MockTransport` (deterministic, for tests and
  oracle parity) or `HttpTransport` (OpenRouter wire format, real use).
- Rate limiting: the reference's global 5 req/s becomes a per-partition
  token bucket of rate/num_partitions — partition count is the
  concurrency knob replacing ThreadPoolExecutor(max_workers=4).
- Fault isolation (T5): per-record try/except; failures become
  'ERROR: <e>' rows with ok=False, never failed tasks.
- Scale: mapInPandas streams Arrow batches; no group list ever sits on
  the driver. 1M groups on 1000 executors is the same code.

The mock reply is md5(prompt) — deterministic and, crucially,
reproducible in ANSI SQL, so even this operator is DuckDB-oracle-checked
end to end.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from hashlib import md5 as _md5

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("output", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("prompt_tokens", T.LongType()),
        T.StructField("completion_tokens", T.LongType()),
        T.StructField("total_tokens", T.LongType()),
        T.StructField("cost", T.DoubleType()),
    ]
)

EMPTY_FOLDER = "Empty folder"
UNSUPPORTED = "Unsupported file type"

# D6 multimodal content column: an ordered array of message parts.
# ptype 'text' carries the (labeled) text; ptype 'image_url' carries the
# base64 data-URL (worker.py:69-98). Kept flat (no nested image_url
# struct) in the DataFrame; transports emit the exact wire shape.
PART_SCHEMA = T.StructType(
    [
        T.StructField("ptype", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

# Flat-rate prompt-token charge per image part in the mock accounting
# (stands in for the provider's per-image billing unit).
IMAGE_TOKEN_COST = 85


@dataclass
class LLMConfig:
    system_prompt: str = ""
    model: str = "mock/deterministic"
    reasoning_mode: str = "off"  # off | true | false (tri-state, app.py:693-695)
    requests_per_second: float = 0.0  # 0 = unthrottled (mock/local)
    timeout_seconds: float = 120.0


class MockTransport:
    """Deterministic stand-in: reply = md5(system_prompt + prompt).

    Token accounting mirrors the reference's usage fields: prompt tokens
    = whitespace token count of the prompt, completion = 1 per reply.

    Multimodal (``parts``) calls hash a canonical serialization of the
    parts array — ``<ptype>|<content>`` joined by blank lines — so the
    assembled payload (order, labels, data-URLs) is what the DuckDB
    oracle checks, not just a concatenated text. Image parts charge a
    flat IMAGE_TOKEN_COST prompt tokens; text parts their whitespace
    token count.
    """

    def __init__(self, config: LLMConfig):
        self.config = config

    def complete(self, prompt: str | None, parts: list[dict] | None = None) -> dict:
        if parts is not None:
            ser = "\n\n".join(f"{p['ptype']}|{p['content']}" for p in parts)
            p_tok = sum(
                len(p["content"].split()) if p["ptype"] == "text" else IMAGE_TOKEN_COST
                for p in parts
            )
            payload = f"{self.config.system_prompt}\n{ser}"
        else:
            p_tok = len(prompt.split())
            payload = f"{self.config.system_prompt}\n{prompt}"
        reply = _md5(payload.encode("utf-8")).hexdigest()
        return {
            "content": reply,
            "prompt_tokens": p_tok,
            "completion_tokens": 1,
            "total_tokens": p_tok + 1,
            "cost": round(p_tok * 1e-6, 12),
        }


class HttpTransport:
    """OpenRouter chat-completions wire format (worker.py:313-344).

    Network calls are gated behind an explicit opt-in; tests and the
    oracle harness always use MockTransport.
    """

    API_URL = "https://openrouter.ai/api/v1/chat/completions"

    def __init__(self, config: LLMConfig, api_key: str):
        self.config = config
        self.api_key = api_key

    def build_body(self, prompt: str | None, parts: list[dict] | None = None) -> dict:
        """Wire-format payload. With ``parts``, user content is the
        reference's parts array: {type:"text",text} entries and
        {type:"image_url",image_url:{url}} entries (worker.py:313-319,
        built at worker.py:69-98)."""
        if parts is not None:
            user_content: object = [
                {"type": "text", "text": p["content"]}
                if p["ptype"] == "text"
                else {"type": "image_url", "image_url": {"url": p["content"]}}
                for p in parts
            ]
        else:
            user_content = prompt
        messages = [
            {"role": "system", "content": self.config.system_prompt},
            {"role": "user", "content": user_content},
        ]
        body: dict = {"model": self.config.model, "messages": messages}
        if self.config.reasoning_mode in ("true", "false"):
            body["reasoning"] = {"enabled": self.config.reasoning_mode == "true"}
        return body

    def complete(self, prompt: str | None, parts: list[dict] | None = None) -> dict:
        import urllib.request
        import json as _json

        body = self.build_body(prompt, parts)
        req = urllib.request.Request(
            self.API_URL,
            data=_json.dumps(body).encode("utf-8"),
            headers={
                "Authorization": f"Bearer {self.api_key}",
                "Content-Type": "application/json",
            },
        )
        with urllib.request.urlopen(req, timeout=self.config.timeout_seconds) as resp:
            data = _json.loads(resp.read().decode("utf-8"))
        usage = data.get("usage", {})
        return {
            "content": data["choices"][0]["message"]["content"],
            "prompt_tokens": int(usage.get("prompt_tokens", 0) or 0),
            "completion_tokens": int(usage.get("completion_tokens", 0) or 0),
            "total_tokens": int(usage.get("total_tokens", 0) or 0),
            "cost": float(usage.get("cost", 0.0) or 0.0),
        }


def llm_map(
    groups: DataFrame,
    config: LLMConfig,
    transport_factory: Callable[[LLMConfig], object] | None = None,
) -> DataFrame:
    """Run the LLM over grouped work units; returns RESULT_SCHEMA rows.

    Input needs columns: group_id, prompt (pre-assembled), file_count.
    An optional ``parts`` column (array<PART_SCHEMA>) carries multimodal
    content; when present and non-null it takes precedence over
    ``prompt`` and reaches the transport as a list of part dicts.
    Sentinels (P7 empty / P1 unsupported) are handled by the caller via
    prompt=NULL + a sentinel column; here NULL prompts short-circuit.
    """
    factory = transport_factory or MockTransport
    rate = config.requests_per_second
    # Per-partition share of the global budget; partition count is the
    # real concurrency knob (see module docstring). Only touch .rdd when
    # throttling is actually requested — it forces plan analysis.
    per_part_interval = 0.0
    if rate > 0:
        # .rdd is unavailable on a streaming DataFrame; there, pace each
        # micro-batch partition at the full configured rate (partition
        # count is unknown until execution).
        num_parts = 1 if groups.isStreaming else max(groups.rdd.getNumPartitions(), 1)
        per_part_interval = num_parts / rate

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = factory(config)
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                sentinel = getattr(rec, "sentinel", None)
                if sentinel:
                    rows.append((rec.group_id, sentinel, True, 0, 0, 0, 0.0))
                    continue
                try:
                    parts = getattr(rec, "parts", None)
                    if parts is None or isinstance(parts, float):
                        # no parts column, or a null cell (pandas NaN)
                        r = transport.complete(rec.prompt)
                    else:
                        # Arrow hands array<struct> to pandas as a
                        # sequence of dicts; normalize + call the
                        # parts-aware path.
                        r = transport.complete(None, parts=list(parts))
                    rows.append(
                        (
                            rec.group_id,
                            r["content"],
                            True,
                            r["prompt_tokens"],
                            r["completion_tokens"],
                            r["total_tokens"],
                            r["cost"],
                        )
                    )
                except Exception as exc:  # T5: errors become data
                    rows.append((rec.group_id, f"ERROR: {exc}", False, 0, 0, 0, 0.0))
                if per_part_interval > 0:
                    time.sleep(per_part_interval)
            yield pd.DataFrame(rows, columns=[f.name for f in RESULT_SCHEMA.fields])

    return groups.mapInPandas(run, schema=RESULT_SCHEMA)
