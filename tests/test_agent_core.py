"""Agent protocol / control / context tests (reference week-4 days 1-2)."""

import json
import threading

import pytest

from tiny_llm_tpu.agent import (
    AgentError,
    AgentInterrupted,
    CancellationToken,
    ContextManager,
    ContextPolicy,
    FinalAction,
    ToolAction,
    WorkingSummary,
    build_system_prompt,
    compact_messages,
    parse_action,
)
from tiny_llm_tpu.agent.context import bound_tool_result, deterministic_summary


class TestProtocol:
    def test_final(self):
        a = parse_action('{"type": "final", "message": "done"}')
        assert isinstance(a, FinalAction) and a.message == "done"

    def test_tool(self):
        a = parse_action('{"type": "tool", "tool": "read_file", "path": "a.py"}')
        assert isinstance(a, ToolAction)
        assert a.tool == "read_file" and a.args == {"path": "a.py"}
        assert not a.has_side_effects

    def test_side_effect_flag(self):
        a = parse_action(
            '{"type": "tool", "tool": "write_file", "path": "a", "content": "b"}'
        )
        assert a.has_side_effects

    def test_fenced_json_accepted(self):
        a = parse_action('```json\n{"type": "final", "message": "ok"}\n```')
        assert isinstance(a, FinalAction)

    @pytest.mark.parametrize(
        "bad",
        [
            "not json",
            '{"type": "final"}',  # missing message
            '{"type": "final", "message": 3}',  # wrong type
            '{"type": "final", "message": "x", "extra": 1}',
            '{"type": "tool", "tool": "nope", "path": "x"}',
            '{"type": "tool", "tool": "read_file"}',  # missing path
            '{"type": "tool", "tool": "read_file", "path": "x", "junk": 1}',
            '{"type": "tool", "tool": "run_command", "argv": []}',
            '{"type": "tool", "tool": "run_command", "argv": ["ls", 3]}',
            '{"type": "final", "message": "a"} {"type": "final", "message": "b"}',
            '[1, 2]',
            '{"type": "other"}',
        ],
    )
    def test_rejections(self, bad):
        with pytest.raises(AgentError):
            parse_action(bad)

    def test_system_prompt_reflects_policy(self, tmp_path):
        from tiny_llm_tpu.agent import ToolPolicy

        pol = ToolPolicy(
            root=str(tmp_path), allow_writes=False,
            allowed_commands=(("python", "-c"),),
        )
        prompt = build_system_prompt(pol)
        assert "DISABLED" in prompt
        assert "python -c" in prompt


class TestCancellation:
    def test_first_writer_wins(self):
        tok = CancellationToken()
        assert tok.cancel("a") is True
        assert tok.cancel("b") is False
        assert tok.reason == "a"

    def test_raise_if_cancelled(self):
        tok = CancellationToken()
        tok.raise_if_cancelled("x")  # no-op
        tok.cancel("stop")
        with pytest.raises(AgentInterrupted) as e:
            tok.raise_if_cancelled("phase1")
        assert e.value.phase == "phase1" and e.value.reason == "stop"

    def test_run_if_active_linearizes(self):
        tok = CancellationToken()
        assert tok.run_if_active(lambda: 42, "f") == 42
        tok.cancel("late")
        with pytest.raises(AgentInterrupted):
            tok.run_if_active(lambda: 42, "f")

    def test_threaded_single_winner(self):
        tok = CancellationToken()
        wins = []
        def racer(i):
            if tok.cancel(f"r{i}"):
                wins.append(i)
        threads = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(wins) == 1


class TestContext:
    def test_bound_tool_result_head_tail(self):
        text = "A" * 1000 + "B" * 1000
        out = bound_tool_result(text, 300)
        assert len(out) < 400
        assert out.startswith("A") and out.endswith("B")
        assert "truncated" in out

    def test_compact_keeps_anchor_and_recent(self):
        msgs = [{"role": "user", "content": "TASK " + "x" * 50}]
        for i in range(10):
            msgs.append({"role": "assistant", "content": f"step {i} " + "y" * 100})
            msgs.append({"role": "user", "content": f"go on {i} " + "z" * 100})
        out = compact_messages(msgs, max_chars=800, min_recent_turns=2)
        assert sum(len(m["content"]) for m in out) <= 800
        assert out[0]["content"].startswith("TASK")
        assert out[-1]["content"] == msgs[-1]["content"]

    def test_compact_noop_under_budget(self):
        msgs = [{"role": "user", "content": "short"}]
        assert compact_messages(msgs, 1000) == msgs

    def test_manager_bounds_tool_results(self):
        mgr = ContextManager(
            encode=lambda s: len(s) // 4,
            policy=ContextPolicy(max_tokens=4000, reserve_output=1000,
                                 max_tool_result_tokens=50),
        )
        msgs = [
            {"role": "user", "content": "task"},
            {"role": "user", "content": "tool_result: " + "Q" * 4000},
        ]
        out = mgr.prepare(msgs)
        assert len(out[1]["content"]) < 1000

    def test_manager_compacts_over_budget(self):
        mgr = ContextManager(
            encode=lambda s: len(s),
            policy=ContextPolicy(max_tokens=1500, reserve_output=500,
                                 min_recent_turns=1),
        )
        msgs = [{"role": "user", "content": "the task"}]
        for i in range(8):
            msgs.append({"role": "assistant", "content": "m" * 200})
            msgs.append({"role": "user", "content": f"turn{i} " + "n" * 200})
        out = mgr.prepare(msgs)
        assert mgr.compactions == 1
        assert sum(len(m["content"]) for m in out) <= 1000
        assert "[summary of earlier work]" in out[0]["content"]

    def test_summary_roundtrip(self):
        s = WorkingSummary(goal="fix bug", changed_files=["a.py"], next_step="test")
        s2 = WorkingSummary.parse(s.render())
        assert s2 == s

    def test_deterministic_summary_derives_files_and_validation(self):
        msgs = [
            {"role": "user", "content": "please fix the parser"},
            {"role": "user", "content": "tool_result: " + json.dumps(
                {"written": "src/parser.py", "bytes": 10})},
            {"role": "user", "content": "tool_result: " + json.dumps(
                {"argv": ["pytest"], "returncode": 0, "output": ""})},
        ]
        s = deterministic_summary(msgs)
        assert s.goal.startswith("please fix")
        assert s.changed_files == ["src/parser.py"]
        assert "rc=0" in s.validation[0]


class TestTokenExactTruncation:
    def test_truncated_result_measures_within_budget(self):
        # A "tokenizer" with wildly non-uniform token costs (code-like):
        # every digit costs 3 tokens, everything else 1 per 4 chars.
        def encode(s):
            digits = sum(c.isdigit() for c in s)
            return digits * 3 + (len(s) - digits) // 4

        mgr = ContextManager(
            encode=encode,
            policy=ContextPolicy(max_tokens=4000, reserve_output=1000,
                                 max_tool_result_tokens=60),
        )
        content = "tool_result: " + "12345678 " * 500
        out = mgr._bound_tool_result_tokens(content)
        assert encode(out) <= 60
        # Not over-truncated: within a bisection step of the budget.
        assert encode(out) > 30

    def test_under_budget_untouched(self):
        mgr = ContextManager(
            encode=lambda s: len(s) // 4,
            policy=ContextPolicy(max_tokens=4000, reserve_output=1000,
                                 max_tool_result_tokens=100),
        )
        content = "tool_result: short"
        assert mgr._bound_tool_result_tokens(content) == content


class TestSummaryAttemptEvents:
    def _mgr(self, summarize, session):
        return ContextManager(
            encode=lambda s: len(s),
            policy=ContextPolicy(max_tokens=1500, reserve_output=500,
                                 min_recent_turns=1),
            summarize=summarize,
            session_log=session,
        )

    def _overlong(self):
        msgs = [{"role": "user", "content": "the task"}]
        for i in range(8):
            msgs.append({"role": "assistant", "content": "m" * 200})
            msgs.append({"role": "user", "content": f"turn{i} " + "n" * 200})
        return msgs

    def test_model_summary_success_recorded(self):
        from tiny_llm_tpu.agent import memory_session

        log = memory_session()
        mgr = self._mgr(lambda old: WorkingSummary(goal="g"), log)
        mgr.prepare(self._overlong())
        ev = [e for e in log.events if e.type == "summary_attempt"]
        assert len(ev) == 1
        assert ev[0].data == {"summarizer": "model", "ok": True}
        assert any(e.type == "compaction" for e in log.events)

    def test_model_summary_failure_falls_back_and_records(self):
        from tiny_llm_tpu.agent import memory_session

        def bad(old):
            raise ValueError("model refused")

        log = memory_session()
        mgr = self._mgr(bad, log)
        mgr.prepare(self._overlong())
        ev = [e for e in log.events if e.type == "summary_attempt"]
        assert len(ev) == 1
        assert ev[0].data["ok"] is False
        assert "model refused" in ev[0].data["error"]
        assert any(e.type == "compaction" for e in log.events)
