"""GAMMA usage-text parser / wrapper autogen tests (gamma/parser.py twin)."""

import pytest

from pyrosar_ray.functions.gamma_parser import (
    CommandSpec,
    generate_wrapper,
    parse_module,
    parse_usage,
)

MULTI_LOOK = """\
*** Calculate a multi-look intensity (MLI) image from an SLC image ***
*** Copyright 2023, Gamma Remote Sensing, v4.8 ***

usage: multi_look <SLC> <SLC_par> <MLI> <MLI_par> <rlks> <azlks> [loff] [nlines] [scale] [exp]

input parameters:
  SLC      (input) single-look complex image
  SLC_par  (input) SLC ISP image parameter file
  MLI      (output) multi-look intensity image
  MLI_par  (output) MLI ISP image parameter file
  rlks     number of range looks
  azlks    number of azimuth looks
  loff     offset to starting line (default: 0)
  nlines   number of SLC lines to process (default: entire file)
  scale    scale factor for output MLI (default: 1.0)
  exp      exponent for the output MLI (default: 1.0)
"""

DEF_PAR = """\
*** Interferometric model refinement ***
usage: def_mod_demo <int> <def> [model-flag]
input parameters:
  int         (input) interferogram
  def         (output) deformation rate
  model-flag  model selection flag (default: 1)
"""

DEPRECATED = """\
*** offset_fitm has been renamed to offset_fit_mod ***
usage: offset_fitm <offs> <ccp>
"""


def test_parse_usage_golden():
    spec = parse_usage(MULTI_LOOK)
    assert spec.name == "multi_look"
    assert spec.required == ["SLC", "SLC_par", "MLI", "MLI_par", "rlks", "azlks"]
    assert spec.optional == ["loff", "nlines", "scale", "exp"]
    assert spec.summary.startswith("Calculate a multi-look intensity")
    assert spec.docs["SLC_par"] == "(input) SLC ISP image parameter file"
    assert spec.docs["exp"] == "exponent for the output MLI (default: 1.0)"


def test_deprecation_raises():
    with pytest.raises(DeprecationWarning, match="renamed to"):
        parse_usage(DEPRECATED)


def test_double_parameter_raises():
    with pytest.raises(RuntimeError, match="double parameter"):
        parse_usage("usage: foo <a> <a> [b]")


def test_unreplaced_multiarg_raises():
    with pytest.raises(RuntimeError, match="multi-args"):
        parse_usage("usage: lin_comb <nfiles> <f1> <f2> <...> <f_out>")


def test_wrapper_compiles_and_builds_cmd():
    src = generate_wrapper(parse_usage(MULTI_LOOK))
    calls = []
    ns = {"process": lambda cmd, **kw: calls.append((cmd, kw))}
    exec(compile(src, "<gen>", "exec"), ns)
    fn = ns["multi_look"]
    fn("a.slc", "a.par", "a.mli", "a.mli.par", 4, 1, scale=2.5)
    cmd, kw = calls[0]
    assert cmd == ["multi_look", "a.slc", "a.par", "a.mli", "a.mli.par",
                   4, 1, "-", "-", 2.5, "-"]
    assert kw == {"logpath": None, "outdir": None, "shellscript": None}
    assert "multi-look intensity" in ns["multi_look"].__doc__


def test_reserved_and_dashed_names():
    src = generate_wrapper(parse_usage(DEF_PAR))
    ns = {"process": lambda cmd, **kw: ns.setdefault("cmd", cmd)}
    exec(compile(src, "<gen>", "exec"), ns)
    ns["def_mod_demo"]("ifg", drm="rate", model_flag=2)
    assert ns["cmd"] == ["def_mod_demo", "ifg", "rate", 2]


def test_parse_module_skips_deprecated():
    src = parse_module({"multi_look": MULTI_LOOK, "offset_fitm": DEPRECATED})
    assert "def multi_look(" in src
    assert "skipped deprecated command" in src
    assert "offset_fitm has been renamed" in src
    compile(src, "<module>", "exec")


def test_generate_from_spec_directly():
    spec = CommandSpec(name="g2", summary="s", required=["x"], optional=[])
    src = generate_wrapper(spec)
    assert src.startswith("def g2(x, logpath=None")


def test_hasarg_probes_generated_wrappers():
    # the gamma chain's version-capability check (gamma/util.py:379):
    # probe whether the GENERATED wrapper accepts a parameter before
    # choosing the kernel spelling
    from pyrosar_ray.functions.gamma_parser import getargs, hasarg

    src = generate_wrapper(parse_usage(MULTI_LOOK))
    ns = {"process": lambda cmd, **kw: None}
    exec(compile(src, "<gen>", "exec"), ns)
    fn = ns["multi_look"]
    args = getargs(fn)
    assert args == sorted(args)
    assert hasarg(fn, "rlks") and hasarg(fn, "logpath")
    assert not hasarg(fn, "edge_flag")
