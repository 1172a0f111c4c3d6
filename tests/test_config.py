"""P8 job-config validation gates (no Spark needed)."""

from __future__ import annotations

import pytest

from openrouter_batch_processor_spark.plans.config import JobConfig


def _base(**kw):
    args = dict(api_key="k", system_prompt="p", input_folder="in/")
    args.update(kw)
    return JobConfig(**args)


class TestValidation:
    def test_valid_passes(self):
        assert _base().validate() is not None

    @pytest.mark.parametrize(
        "kw", [{"api_key": "  "}, {"system_prompt": ""}, {"reasoning_mode": "maybe"}]
    )
    def test_gates(self, kw):
        with pytest.raises(ValueError):
            _base(**kw).validate()

    def test_no_input_source(self):
        with pytest.raises(ValueError, match="no input source"):
            JobConfig(api_key="k", system_prompt="p").validate()


class TestResolution:
    def test_input_precedence(self):
        cfg = _base(input_zip="z.zip", upload="u.zip")
        assert cfg.resolved_input() == ("folder", "in/")
        cfg = JobConfig(api_key="k", system_prompt="p", input_zip="z.zip", upload="u.zip")
        assert cfg.resolved_input() == ("existing", "z.zip")
        cfg = JobConfig(api_key="k", system_prompt="p", upload="u.zip")
        assert cfg.resolved_input() == ("uploaded", "u.zip")

    def test_custom_model_override(self):
        assert _base(custom_model=" my/model ").resolved_model() == "my/model"
        assert _base(custom_model="  ").resolved_model() == "mock/deterministic"

    def test_format_defaulting(self):
        assert _base(output_formats=[" CSV", "bogus", "csv"]).resolved_formats() == ["csv"]
        assert _base(separate_outputs=True).resolved_formats() == ["text"]
        assert _base().resolved_formats() == ["csv"]
