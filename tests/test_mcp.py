"""MCP server wire contract, pinned against the reference's own
cmd/mcp/mcp.go (tool names, protocol version and error strings are
HARVESTED from the reference source at test time, not copied).

Ref anchors: cmd/mcp/mcp.go:118-133 (initialize), :134-144 +
emission guard :92 (notifications), :146-184 (tools/list),
:185-222 (method/param errors), :300-310 (tool-call errors),
:337-390 (docs tree + not-found hint).
"""

from __future__ import annotations

import io
import json
import re
from pathlib import Path

import pytest

from bruin_spark.mcpserver import (
    default_docs_root,
    get_doc_content,
    get_docs_tree,
    process_request,
    run_mcp_server,
)

REF_MCP = Path("/root/reference/cmd/mcp/mcp.go")
DOCS = default_docs_root()


def _req(method, req_id=1, params=None):
    r = {"jsonrpc": "2.0", "id": req_id, "method": method}
    if params is not None:
        r["params"] = params
    return r


def _call(tool, arguments=None, req_id=1):
    params = {"name": tool}
    if arguments is not None:
        params["arguments"] = arguments
    return process_request(_req("tools/call", req_id, params), DOCS)


@pytest.fixture(scope="module")
def ref_source() -> str:
    if not REF_MCP.exists():
        pytest.skip("reference tree unavailable")
    return REF_MCP.read_text()


def test_tool_names_match_reference(ref_source):
    ref_tools = re.findall(r'"name":\s+"(bruin_[a-z_]+)"', ref_source)
    assert ref_tools, "harvest regex broke"
    resp = process_request(_req("tools/list"), DOCS)
    ours = [t["name"] for t in resp["result"]["tools"]]
    assert ours == ref_tools


def test_initialize_matches_reference(ref_source):
    m = re.search(r'"protocolVersion":\s+"([0-9-]+)"', ref_source)
    resp = process_request(_req("initialize"), DOCS)
    res = resp["result"]
    assert res["protocolVersion"] == m.group(1)
    assert res["serverInfo"]["name"] == "bruin"
    assert "tools" in res["capabilities"]
    assert resp["id"] == 1


def test_error_codes_match_reference(ref_source):
    # the reference uses -32601 for unknown method/tool, -32602 for params
    assert "-32601" in ref_source and "-32602" in ref_source
    resp = process_request(_req("no/such/method"), DOCS)
    assert resp["error"]["code"] == -32601
    assert resp["error"]["message"] == "Method not found: no/such/method"

    resp = _call("bruin_launch_rockets")
    assert resp["error"]["code"] == -32601
    assert resp["error"]["message"] == "Unknown tool: bruin_launch_rockets"

    resp = process_request(_req("tools/call", params="bogus"), DOCS)
    assert resp["error"] == {"code": -32602, "message": "Invalid params"}

    resp = process_request(_req("tools/call", params={"no_name": 1}), DOCS)
    assert resp["error"] == {"code": -32602, "message": "Missing tool name"}

    resp = _call("bruin_get_doc_content", arguments=None)
    assert resp["error"] == {"code": -32602, "message": "Invalid arguments"}

    resp = _call("bruin_get_doc_content", arguments={"filename": 7})
    assert resp["error"] == {
        "code": -32602,
        "message": "Missing or invalid filename parameter",
    }


def test_notifications_are_not_answered():
    assert process_request({"method": "notifications/initialized"}, DOCS) is None
    assert process_request({"method": "initialized"}, DOCS) is None
    # with an explicit id the ack IS emitted, result omitted on the wire
    resp = process_request(_req("initialized", req_id=9), DOCS)
    assert resp == {"jsonrpc": "2.0", "id": 9, "result": None}


def test_overview_tool_returns_overview_md():
    resp = _call("bruin_get_overview")
    text = resp["result"]["content"][0]["text"]
    assert text == (DOCS / "overview.md").read_text()
    assert "bruin_spark" in text


def test_docs_tree_lists_every_file_and_is_fenced():
    tree = get_docs_tree(DOCS)
    assert tree.startswith("```\nBruin Documentation\n")
    assert tree.endswith("```\n")
    for p in DOCS.rglob("*.md"):
        assert p.name in tree, f"{p} missing from the tree"
    # directories render before files, with tree connectors
    assert "├── " in tree and "└── " in tree


def test_every_doc_file_is_retrievable():
    files = list(DOCS.rglob("*.md"))
    assert len(files) >= 15  # a real docs tree, not a stub
    for p in files:
        rel = str(p.relative_to(DOCS))
        body = p.read_text()
        assert get_doc_content(DOCS, rel) == body
        # .md extension is optional (ref: mcp.go:372-374)
        assert get_doc_content(DOCS, rel[: -len(".md")]) == body


def test_missing_file_error_lists_valid_paths():
    msg = get_doc_content(DOCS, "no/such/doc")
    assert msg.startswith("Error: File 'no/such/doc.md' not found.")
    assert "Valid paths are:" in msg
    assert "commands/" in msg and "overview.md" in msg
    assert "bruin_get_docs_tree" in msg


def test_path_traversal_is_contained():
    # an on-disk docs root must not serve files outside the tree
    msg = get_doc_content(DOCS, "../SURVEY")
    assert msg.startswith("Error: File '../SURVEY.md' not found.")
    msg = get_doc_content(DOCS, "../../etc/passwd")
    assert msg.startswith("Error:")


def test_server_loop_end_to_end():
    lines = [
        json.dumps(_req("initialize", req_id=0)),
        "this is not json",  # skipped, not answered
        json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
        json.dumps(_req("tools/list", req_id=1)),
        json.dumps(
            _req(
                "tools/call",
                req_id=2,
                params={
                    "name": "bruin_get_doc_content",
                    "arguments": {"filename": "commands/run"},
                },
            )
        ),
        json.dumps(_req("bogus", req_id=3)),
    ]
    out = io.StringIO()
    rc = run_mcp_server(io.StringIO("\n".join(lines) + "\n"), out, docs_root=DOCS)
    assert rc == 0
    responses = [json.loads(line) for line in out.getvalue().splitlines()]
    # 4 answered: initialize, tools/list, tools/call, bogus (notification
    # and the garbage line produce nothing)
    assert [r["id"] for r in responses] == [0, 1, 2, 3]
    assert responses[0]["result"]["serverInfo"]["name"] == "bruin"
    assert len(responses[1]["result"]["tools"]) == 3
    text = responses[2]["result"]["content"][0]["text"]
    assert text == (DOCS / "commands" / "run.md").read_text()
    assert responses[3]["error"]["code"] == -32601
    # no response carries a null result on the wire (Go omitempty shape)
    assert all("result" not in r or r["result"] is not None for r in responses)


def test_cli_registers_mcp():
    from bruin_spark.cli import main

    with pytest.raises(SystemExit) as exc:
        main(["mcp", "--help"])
    assert exc.value.code == 0


def test_non_utf8_doc_degrades_instead_of_crashing(tmp_path):
    (tmp_path / "overview.md").write_text("# ok")
    (tmp_path / "latin.md").write_bytes("caf\xe9 cr\xe8me".encode("latin-1"))
    body = get_doc_content(tmp_path, "latin")
    assert "caf" in body  # served with replacement chars, not an exception
    out = io.StringIO()
    req = json.dumps(
        _req(
            "tools/call",
            1,
            {"name": "bruin_get_doc_content", "arguments": {"filename": "latin"}},
        )
    )
    rc = run_mcp_server(io.StringIO(req + "\n"), out, docs_root=tmp_path)
    assert rc == 0 and json.loads(out.getvalue())["id"] == 1


# -- adversarial fuzz: the loop must survive ANY client ------------------------


def test_server_loop_survives_adversarial_frames(tmp_path):
    """200+ seeded hostile frames through the real line loop: oversized
    lines, invalid/degenerate JSON, batched arrays, nested ids, NUL and
    traversal filenames, wrong-typed params.  The loop must (1) never
    raise, (2) emit only valid JSON responses, (3) use only the
    reference's -32601/-32602 error codes, and (4) never leak file
    content from outside the docs root."""
    import random

    rng = random.Random(20260816)
    secret = tmp_path / "secret.txt"
    secret.write_text("TOP-SECRET-CANARY-9c4e1")
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "overview.md").write_text("# overview\n")

    def call_frame(filename, req_id=1):
        return json.dumps(
            {
                "jsonrpc": "2.0",
                "id": req_id,
                "method": "tools/call",
                "params": {
                    "name": "bruin_get_doc_content",
                    "arguments": {"filename": filename},
                },
            }
        )

    frames: list[str] = []
    # malformed / degenerate JSON
    frames += [
        "", "   ", "{", "}", "null", "true", "42", '"just a string"',
        "[1, 2, 3]", '[{"jsonrpc": "2.0", "id": 1, "method": "tools/list"}]',
        '{"jsonrpc": "2.0"', "\x00", "\xff\xfe garbage", "{}" * 5,
        '{"a": NaN}', '{"method": "tools/list", "id": ',
    ]
    # oversized lines: a 1 MiB junk line and a 1 MiB valid filename
    frames.append("x" * (1 << 20))
    frames.append(call_frame("a" * (1 << 20)))
    # id-less / weird-id requests
    frames += [
        json.dumps({"jsonrpc": "2.0", "method": "tools/list"}),
        json.dumps({"jsonrpc": "2.0", "id": None, "method": "tools/list"}),
        json.dumps({"jsonrpc": "2.0", "id": {"k": [1]}, "method": "tools/list"}),
        json.dumps({"jsonrpc": "2.0", "id": [1, 2], "method": "nope"}),
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": {"not": "a string"}}),
        json.dumps({"jsonrpc": "2.0", "id": 1}),
    ]
    # wrong-typed params / tool names / arguments
    for bad_params in (None, 17, "x", [], {"name": 3}, {"name": "bruin_get_doc_content"},
                       {"name": "bruin_get_doc_content", "arguments": "f"},
                       {"name": "bruin_get_doc_content", "arguments": {"filename": 9}},
                       {"name": "no_such_tool", "arguments": {}}):
        frames.append(json.dumps(
            {"jsonrpc": "2.0", "id": 1, "method": "tools/call", "params": bad_params}
        ))
    # hostile filenames: NUL bytes, traversal, absolute, device-ish, long
    hostile = [
        "over\x00view", "\x00", "a\x00.md", "../secret.txt", "../../secret.txt",
        "../" * 40 + "etc/passwd", "/etc/passwd", str(secret), "..", ".", "/",
        "....//secret.txt", "sub/../../secret.txt", "con", "\\..\\secret.txt",
        "\ud800bad-surrogate", "n" * 5000, ("deep/" * 200) + "x.md", "secret.txt",
    ]
    frames += [call_frame(f, req_id=i + 10) for i, f in enumerate(hostile)]
    # seeded random junk + random near-valid frames to pass 200 total
    charset = '{}[]":,abc\\/é\n\t '
    while len(frames) < 210:
        if rng.random() < 0.5:
            frames.append("".join(rng.choice(charset) for _ in range(rng.randint(1, 80))))
        else:
            frames.append(call_frame("".join(
                rng.choice("ab/.\x00é-") for _ in range(rng.randint(1, 30))
            ), req_id=rng.randint(-5, 5)))
    rng.shuffle(frames)
    # close with a well-formed call to prove the loop is still alive
    frames.append(call_frame("overview.md", req_id="final"))

    stdin = io.StringIO("\n".join(frames) + "\n")
    stdout = io.StringIO()
    rc = run_mcp_server(stdin, stdout, docs_root=docs)
    assert rc == 0
    responses = [json.loads(line) for line in stdout.getvalue().splitlines()]
    assert responses  # the loop answered something
    for r in responses:
        assert r.get("jsonrpc") == "2.0"
        if "error" in r:
            assert r["error"]["code"] in (-32601, -32602)
        assert "TOP-SECRET-CANARY-9c4e1" not in json.dumps(r)
    finals = [r for r in responses if r.get("id") == "final"]
    assert len(finals) == 1 and "# overview" in finals[0]["result"]["content"][0]["text"]
