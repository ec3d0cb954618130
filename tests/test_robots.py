"""RFC 9309 robots.txt semantics (functions/robots.py)."""

from pyrosar_ray.functions.robots import RobotsMatcher, compile_rule, parse_robots

ROBOTS = """\
# comment only
Sitemap: http://x/s.xml

User-agent: alphabot
User-agent: betabot
Disallow: /private/
Allow: /private/open*

User-agent: *
Disallow: /tmp/
Crawl-delay: 7
Disallow:
"""


def test_shared_group_and_star():
    g = parse_robots(ROBOTS)
    assert g["alphabot"] == g["betabot"] == [
        ("/private/", False),
        ("/private/open*", True),
    ]
    # empty Disallow contributes nothing; crawl-delay ignored
    assert g["*"] == [("/tmp/", False)]


def test_group_shadowing_not_merging():
    """A bot with its own group never sees the * rules (RFC 9309 2.2.1)."""
    m = RobotsMatcher(ROBOTS, "alphabot")
    assert m.decision("/tmp/x") == (True, "")  # * group does NOT apply
    assert m.decision("/private/x") == (False, "/private/")
    assert m.decision("/private/openx") == (True, "/private/open*")
    other = RobotsMatcher(ROBOTS, "unknownbot")
    assert other.decision("/tmp/x") == (False, "/tmp/")


def test_longest_match_and_allow_tie():
    txt = "User-agent: *\nDisallow: /a/\nAllow: /a/b/\nDisallow: /a/b/c\n"
    m = RobotsMatcher(txt, "anybot")
    assert m.decision("/a/x")[0] is False
    assert m.decision("/a/b/x")[0] is True  # longer allow beats /a/
    assert m.decision("/a/b/c")[0] is False  # longest disallow wins
    # equal-length tie prefers allow
    tie = RobotsMatcher("User-agent: *\nDisallow: /p/\nAllow: /q*/\n", "b")
    assert tie.decision("/q//")[0] is True


def test_wildcards_and_anchor():
    assert compile_rule("/a/*.php$").match("/a/x/y.php")
    assert not compile_rule("/a/*.php$").match("/a/x.php?q=1")
    assert compile_rule("/a/*.php").match("/a/x.php?q=1")  # unanchored
    m = RobotsMatcher("User-agent: *\nDisallow: /*?session\n", "b")
    assert m.decision("/page?session=1")[0] is False
    assert m.decision("/page?other=1")[0] is True


def test_rules_before_any_group_ignored():
    g = parse_robots("Disallow: /x/\nUser-agent: *\nDisallow: /y/\n")
    assert g["*"] == [("/y/", False)]


def test_parse_robots_never_raises_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    lines = st.text(
        alphabet=st.sampled_from(
            list("abcABC*$/:#-\n\r\t Userangentdisalow")
        ),
        max_size=400,
    )

    @settings(max_examples=200, deadline=None)
    @given(lines)
    def run(text):
        m = RobotsMatcher(text, "anybot")
        ok, rule = m.decision("/any/path")
        assert isinstance(ok, bool) and isinstance(rule, str)

    run()
