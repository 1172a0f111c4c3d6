"""P8 + D1 — job configuration: the validated pipeline-instance IR.

The reference's logical plan is the flat `meta` dict built by
handle_submission (app.py:658-804): required api key + system prompt,
input-source precedence folder > existing zip > upload, model resolution
with custom override, reasoning tri-state, output-format whitelist.
Here it is an explicit dataclass: construct -> validate -> hand to the
pipeline builder. Driver-side control plane, deliberately not a Spark
job — validation of one config is not data-plane work.
"""

from __future__ import annotations

from dataclasses import dataclass, field

VALID_FORMATS = ("text", "csv", "json")
VALID_REASONING = ("off", "true", "false")  # app.py:693-695 tri-state


@dataclass
class JobConfig:
    api_key: str
    system_prompt: str
    model: str = "mock/deterministic"
    custom_model: str | None = None  # index-route override, app.py:688-692
    reasoning_mode: str = "off"
    group_by_subfolder: bool = True
    separate_outputs: bool = False
    output_formats: list[str] = field(default_factory=list)
    input_folder: str | None = None
    input_zip: str | None = None
    upload: str | None = None
    footer: str = ""
    source_route: str | None = None

    def resolved_model(self) -> str:
        return (self.custom_model or "").strip() or self.model

    def resolved_input(self) -> tuple[str, str]:
        """Input-source precedence: folder > existing zip > upload
        (app.py:706-739). Returns (kind, ref)."""
        if self.input_folder:
            return "folder", self.input_folder
        if self.input_zip:
            return "existing", self.input_zip
        if self.upload:
            return "uploaded", self.upload
        raise ValueError("no input source: provide folder, zip, or upload")

    def resolved_formats(self) -> list[str]:
        """F16 defaulting: empty after whitelist -> ['text'] when
        separate_outputs else ['csv']."""
        seen: list[str] = []
        for f in self.output_formats:
            f = f.strip().lower()
            if f in VALID_FORMATS and f not in seen:
                seen.append(f)
        if not seen:
            return ["text"] if self.separate_outputs else ["csv"]
        return seen

    def validate(self) -> "JobConfig":
        errors = []
        if not self.api_key.strip():
            errors.append("api_key is required")
        if not self.system_prompt.strip():
            errors.append("system_prompt is required")
        if self.reasoning_mode not in VALID_REASONING:
            errors.append(f"reasoning_mode must be one of {VALID_REASONING}")
        try:
            self.resolved_input()
        except ValueError as e:
            errors.append(str(e))
        if errors:
            raise ValueError("; ".join(errors))
        return self
