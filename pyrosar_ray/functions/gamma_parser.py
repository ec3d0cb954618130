"""GAMMA usage-text parser + Python wrapper autogeneration.

Engine twin of the reference's API auto-generation
(pyroSAR/gamma/parser.py:28-727: run each installed GAMMA binary,
scrape its usage text, emit a Python wrapper module). No GAMMA ships
in any deployment of this engine, so the parser here consumes usage
TEXT as data — callers that do have binaries feed ``stdout+stderr``
straight in; tests feed synthetic usage blocks with the real grammar.

Grammar parsed (the format every GAMMA command prints):

- header lines framed by ``***`` → the function summary
- the ``usage: <cmd> <req1> <req2> [opt1] [opt2]`` line →
  required (``<>``) and optional (``[]``) parameter lists
- the ``input parameters:`` block → per-parameter descriptions

Wrapper generation mirrors the reference's conventions: optional args
default to ``'-'`` (GAMMA's "unset" token), ``-`` in names becomes
``_``, the reserved name ``def`` becomes ``drm``, every wrapper takes
``logpath/outdir/shellscript`` and delegates to a caller-supplied
``process`` callable. Deprecation notices raise, double parameters
raise, unhandled multi-arg ellipses raise — same failure surface as
the reference.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field


@dataclass
class CommandSpec:
    """Parsed shape of one GAMMA command's usage text."""

    name: str
    summary: str
    required: list[str]
    optional: list[str]
    docs: dict[str, str] = field(default_factory=dict)


_DEPRECATION_RE = re.compile(
    r"([\w.]+ (?:has been|was) re(?:named to|placed(?: that [ *\n]*|) by)"
    r"(?:[ *\n]*|)(?: the ISP program|) [\w.]+)"
)


def _pyname(par: str) -> str:
    out = par.replace("-", "_")
    return "drm" if out == "def" else out


def parse_usage(text: str) -> CommandSpec:
    """Parse one command's usage text into a :class:`CommandSpec`.

    Raises ``DeprecationWarning`` when the header carries a
    renamed/replaced notice, ``RuntimeError`` on double parameters or
    multi-arg ellipses (``...``) the caller did not pre-replace.
    """
    header_lines = [x.strip("* ") for x in re.findall(r"\*{3}.*?(?:\*{3}|$)", text)]
    summary = " ".join(line for line in header_lines if line)
    match = _DEPRECATION_RE.search(summary)
    if match:
        raise DeprecationWarning(match.group())

    usage_match = re.search(r"usage:\s*(.*)", text)
    if usage_match is None:
        raise RuntimeError("no usage line found")
    usage = usage_match.group(1).strip()
    name = usage.split()[0]

    required = [re.sub(r"[^\w.-]", "", x) for x in re.findall(r"<([^>]*)>", usage)]
    optional = [re.sub(r"[^\w.-]", "", x) for x in re.findall(r"\[([^]]*)\]", usage)]
    if ".." in usage:
        raise RuntimeError("the command contains multi-args which were not properly parsed")

    double = [k for k, v in Counter(required + optional).items() if v > 1]
    if double:
        plural = "s" if len(double) > 1 else ""
        raise RuntimeError(f"double parameter{plural}: {', '.join(double)}")

    # per-parameter docs: lines '  <par>   description' after the
    # 'input parameters:' marker (fallback: after the usage line)
    docs: dict[str, str] = {}
    marker = re.search(r"input parameters:[ ]*\n", text)
    body = text[(marker.end() if marker else usage_match.end()):]
    all_pars = required + optional
    if all_pars:
        pattern = re.compile(
            r"\n[ ]*[<\[]?(?P<par>{0})[>\]]?[\t ]+(?P<doc>.*)".format(
                "|".join(re.escape(p) for p in all_pars)
            )
        )
        starts = [m.start() for m in pattern.finditer("\n" + body)]
        starts.append(len(body) + 1)
        for i in range(len(starts) - 1):
            chunk = ("\n" + body)[starts[i] : starts[i + 1]]
            m = pattern.search(chunk)
            if m is None:
                continue
            par, doc = m.group("par"), m.group("doc")
            extra = [ln.strip() for ln in chunk[m.end():].splitlines() if ln.strip()]
            full = " ".join([doc.strip()] + extra).strip()
            docs.setdefault(par, full)
    return CommandSpec(name=name, summary=summary, required=required,
                       optional=optional, docs=docs)


def generate_wrapper(spec: CommandSpec, indent: str = "    ") -> str:
    """Emit the Python wrapper function source for a parsed command.

    The wrapper signature is ``def <name>(req..., opt='-', ...,
    logpath=None, outdir=None, shellscript=None)`` with an rst
    docstring, building ``cmd`` and delegating to ``process`` — the
    same calling convention the reference generates so downstream
    pipelines are drop-in compatible.
    """
    fn_name = re.sub(r"^(\d)", r"g\1", spec.name.replace("-", "_"))
    args = [_pyname(p) for p in spec.required]
    args += [f"{_pyname(p)}='-'" for p in spec.optional]
    argstr = ", ".join(args + ["logpath=None", "outdir=None", "shellscript=None"])

    doc_lines = [indent + '"""', indent + spec.summary, ""]
    for par in spec.required + spec.optional:
        doc_lines.append(f"{indent}{_pyname(par)}:")
        desc = spec.docs.get(par, "")
        optional_note = " (optional)" if par in spec.optional else ""
        doc_lines.append(f"{indent}{indent}{desc}{optional_note}".rstrip())
    doc_lines.append(indent + '"""')

    proc_args = ", ".join(_pyname(p) for p in spec.required + spec.optional)
    body = [
        f"{indent}cmd = ['{spec.name}'{', ' if proc_args else ''}{proc_args}]",
        f"{indent}process(cmd, logpath=logpath, outdir=outdir, shellscript=shellscript)",
    ]
    return "\n".join(
        [f"def {fn_name}({argstr}):"] + doc_lines + body
    )


_MODULE_HEADER = '''\
"""Auto-generated GAMMA API wrappers (engine twin of gamma/parser.py).

Each function shells one GAMMA command through the supplied
``process`` callable; optional parameters default to GAMMA's '-'
placeholder.
"""
'''


def parse_module(usages: dict[str, str] | list[str]) -> str:
    """Assemble a wrapper module's source from many usage texts.

    ``usages``: mapping of command name → usage text (or just a list
    of texts). Deprecated commands are skipped with a comment, like
    the reference's tolerant module loop (gamma/parser.py:634-692).
    """
    texts = list(usages.values()) if isinstance(usages, dict) else usages
    parts = [_MODULE_HEADER]
    for text in texts:
        try:
            spec = parse_usage(text)
        except DeprecationWarning as warn:
            parts.append(f"# skipped deprecated command: {warn}")
            continue
        parts.append(generate_wrapper(spec))
    return "\n\n\n".join(parts) + "\n"


def getargs(func) -> list[str]:
    """Sorted argument names of a callable (reference
    pyroSAR/ancillary.py:332-345). Used to probe which parameters a
    generated GAMMA wrapper accepts — the version-capability check the
    gamma chain runs before choosing a kernel spelling
    (gamma/util.py:379,641,1457; gamma/dem.py:222)."""
    import inspect

    return sorted(inspect.getfullargspec(func).args)


def hasarg(func, arg: str) -> bool:
    """Does the callable take ``arg``? (reference ancillary.py:348-363)."""
    return arg in getargs(func)
