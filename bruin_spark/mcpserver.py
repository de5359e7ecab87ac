"""`bruin mcp` — a Model Context Protocol server over stdin/stdout.

The reference ships an MCP server for IDE integration
(ref: cmd/mcp/mcp.go:41-110): a line-oriented JSON-RPC 2.0 loop that
exposes three documentation tools backed by an embedded docs tree —
``bruin_get_overview`` (overview.md), ``bruin_get_docs_tree`` (an
ASCII tree of every .md file), and ``bruin_get_doc_content`` (one
file by path, ``.md`` optional).  This module reproduces that wire
contract over the engine's own ``docs/`` tree:

- ``initialize`` answers protocolVersion ``2024-11-05`` with a
  ``tools`` capability (ref: mcp.go:118-133);
- ``initialized`` / ``notifications/initialized`` produce NO response
  when the request carries no id (notifications are not answered,
  ref: mcp.go:134-144 + the emission guard at mcp.go:92);
- unknown methods answer JSON-RPC error ``-32601``, malformed
  ``tools/call`` params answer ``-32602`` with the reference's
  message strings (ref: mcp.go:185-222, 300-310);
- unparseable input lines are skipped, not answered (ref: mcp.go:80-85).

The docs tree itself lives at ``<repo>/docs`` (authored for this
engine, same layout families as the reference's: commands/,
core-concepts/, platforms/, ingestion/, llm-pipelines/).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

PROTOCOL_VERSION = "2024-11-05"

#: tool inventory — names and schemas match the reference's tools/list
#: response (ref: cmd/mcp/mcp.go:146-184)
TOOLS = [
    {
        "name": "bruin_get_overview",
        "description": "Get information about Bruin's features and capabilities",
        "inputSchema": {"type": "object", "properties": {}},
    },
    {
        "name": "bruin_get_docs_tree",
        "description": (
            "Get tree view of documentation files for Bruin, including all "
            "the supported platforms, data sources and destinations."
        ),
        "inputSchema": {"type": "object", "properties": {}},
    },
    {
        "name": "bruin_get_doc_content",
        "description": (
            "Get the contents of a specific documentation file from Bruin "
            "CLI docs. Use bruin_get_docs_tree first to see all available "
            "directories and files. You can access files in subdirectories "
            "(e.g., 'ingestion/overview', 'platforms/spark', 'commands/run') "
            "or root-level files (e.g., 'overview', 'index'). The .md "
            "extension is optional."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "filename": {
                    "type": "string",
                    "description": (
                        "Path to the markdown file (e.g., 'ingestion/overview', "
                        "'platforms/spark', 'overview'). The .md extension is "
                        "optional."
                    ),
                }
            },
            "required": ["filename"],
        },
    },
]


def default_docs_root() -> Path:
    return Path(__file__).resolve().parent.parent / "docs"


def _error(req_id, code: int, message: str) -> dict:
    return {"jsonrpc": "2.0", "id": req_id, "error": {"code": code, "message": message}}


def _text_result(req_id, text: str) -> dict:
    return {
        "jsonrpc": "2.0",
        "id": req_id,
        "result": {"content": [{"type": "text", "text": text}]},
    }


def _safe_read(docs_root: Path, rel: str) -> str | None:
    """Read one doc file; None when absent or escaping the tree.

    The reference reads through an embedded ``fs.FS``, whose path rules
    reject ``..`` and absolute paths outright — an on-disk tree needs
    the explicit containment check."""
    # A NUL byte in a JSON string is valid JSON but poison for the
    # filesystem layer: Path.resolve() raises ValueError on Linux.
    # Treat it as not-found rather than letting one malformed request
    # kill the server loop (the reference's fs.FS returns an error).
    if "\x00" in rel:
        return None
    try:
        p = (docs_root / rel).resolve()
        p.relative_to(docs_root.resolve())
    except ValueError:
        return None
    try:
        # errors='replace': a stray non-UTF-8 doc must degrade to
        # mojibake in ONE tool answer, not kill the server loop
        return p.read_text(errors="replace")
    except OSError:
        return None


def get_overview(docs_root: Path) -> str:
    text = _safe_read(docs_root, "overview.md")
    if text is None:
        return "Error: Could not read overview.md: file does not exist"
    return text


def _tree_lines(d: Path, prefix: str, out: list[str]) -> None:
    """treeprint-shaped rendering: directories (sorted) before .md files
    (sorted), `├──`/`└──` connectors with `│` continuation — the shape
    the reference's treeprint dependency emits (ref: mcp.go:337-365)."""
    try:
        entries = sorted(d.iterdir(), key=lambda p: p.name)
    except OSError:
        return
    dirs = [e for e in entries if e.is_dir()]
    files = [e for e in entries if e.is_file() and e.name.endswith(".md")]
    items: list[Path] = dirs + files
    for i, item in enumerate(items):
        last = i == len(items) - 1
        connector = "└── " if last else "├── "
        out.append(prefix + connector + item.name)
        if item.is_dir():
            _tree_lines(item, prefix + ("    " if last else "│   "), out)


def get_docs_tree(docs_root: Path) -> str:
    lines = ["Bruin Documentation"]
    _tree_lines(docs_root, "", lines)
    return "```\n" + "\n".join(lines) + "\n```\n"


def get_doc_content(docs_root: Path, filename: str) -> str:
    if not filename.endswith(".md"):
        filename += ".md"
    text = _safe_read(docs_root, filename)
    if text is not None:
        return text
    # the not-found message enumerates valid top-level dirs and root
    # files, exactly the recovery hint the reference gives (mcp.go:376-390)
    dirs: list[str] = []
    root_files: list[str] = []
    try:
        for entry in sorted(docs_root.iterdir(), key=lambda p: p.name):
            if entry.is_dir():
                dirs.append(entry.name + "/")
            elif entry.name.endswith(".md"):
                root_files.append(entry.name)
    except OSError:
        return f"Error reading docs: {docs_root} is not readable"
    return (
        f"Error: File '{filename}' not found. Valid paths are: "
        f"{', '.join(dirs)} or root files like {', '.join(root_files)}. "
        "Use bruin_get_docs_tree to see all available files."
    )


def _handle_tool_call(req: dict, docs_root: Path) -> dict:
    req_id = req.get("id")
    params = req.get("params")
    if not isinstance(params, dict):
        return _error(req_id, -32602, "Invalid params")
    tool = params.get("name")
    if not isinstance(tool, str):
        return _error(req_id, -32602, "Missing tool name")
    if tool == "bruin_get_overview":
        return _text_result(req_id, get_overview(docs_root))
    if tool == "bruin_get_docs_tree":
        return _text_result(req_id, get_docs_tree(docs_root))
    if tool == "bruin_get_doc_content":
        args = params.get("arguments")
        if not isinstance(args, dict):
            return _error(req_id, -32602, "Invalid arguments")
        filename = args.get("filename")
        if not isinstance(filename, str):
            return _error(req_id, -32602, "Missing or invalid filename parameter")
        return _text_result(req_id, get_doc_content(docs_root, filename))
    return _error(req_id, -32601, "Unknown tool: " + tool)


def process_request(req: dict, docs_root: Path) -> dict | None:
    """One JSON-RPC request -> response dict, or None for notifications
    (the caller emits nothing for None, matching the reference's
    ``response.ID != nil`` emission guard)."""
    method = req.get("method")
    req_id = req.get("id")
    if method == "initialize":
        import bruin_spark

        return {
            "jsonrpc": "2.0",
            "id": req_id,
            "result": {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "bruin", "version": bruin_spark.__version__},
            },
        }
    if method in ("initialized", "notifications/initialized"):
        if req_id is None:
            return None
        # acknowledged with an explicit null result (ref: mcp.go:137-143)
        return {"jsonrpc": "2.0", "id": req_id, "result": None}
    if method == "tools/list":
        return {"jsonrpc": "2.0", "id": req_id, "result": {"tools": TOOLS}}
    if method == "tools/call":
        return _handle_tool_call(req, docs_root)
    return _error(req_id, -32601, "Method not found: " + str(method))


def run_mcp_server(
    stdin=None,
    stdout=None,
    *,
    debug: bool = False,
    docs_root: Path | None = None,
) -> int:
    """The line loop: read one JSON-RPC request per line, answer on
    stdout.  Unparseable lines are skipped; responses without an id
    (notifications) are swallowed."""
    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout
    root = docs_root if docs_root is not None else default_docs_root()
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except ValueError:
            if debug:
                print(f"Failed to parse JSON-RPC request: {line!r}", file=sys.stderr)
            continue
        if not isinstance(req, dict):
            continue
        resp = process_request(req, root)
        if resp is None or resp.get("id") is None:
            continue
        # match the reference's omitempty marshalling: a null result
        # (including the initialized ack's) is dropped from the wire
        if resp.get("result") is None and "error" not in resp:
            resp = {k: v for k, v in resp.items() if k != "result"}
        stdout.write(json.dumps(resp) + "\n")
        stdout.flush()
    return 0
