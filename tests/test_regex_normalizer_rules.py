"""TestRegexURLNormalizer port (urlnormalizer-regex/src/test/...:38-140)
over the plugin's own sample rule files + url matrices (embedded below
verbatim from src/plugin/urlnormalizer-regex/sample/ — Apache-2.0 test
data): the XML rule-file parser, Java->Python regex/substitution
adaptation, and per-scope chains."""

import pytest

from coherencebot_ray.functions.normalizers import (
    RegexNormalizer,
    URLNormalizers,
    parse_regex_normalize_xml,
)

DEFAULT_XML = '<?xml version="1.0"?>\n<!-- This is the configuration file for the RegexUrlNormalize Class.\n     This is intended so that users can specify substitutions to be\n     done on URLs using the Java regex syntax, see\n     https://docs.oracle.com/javase/8/docs/api/java/util/regex/Pattern.html\n     The rules are applied to URLs in the order they occur in this file.  -->\n\n<!-- WATCH OUT: an xml parser reads this file an ampersands must be\n     expanded to &amp; -->\n\n<!-- The following rules show how to strip out session IDs, default pages, \n     interpage anchors, etc. Order does matter!  -->\n<regex-normalize>\n\n<!-- removes session ids from urls (such as jsessionid and PHPSESSID) -->\n<regex>\n  <pattern>(?i)(;?\\b_?(l|j|bv_)?(sid|phpsessid|sessionid)=.*?)(\\?|&amp;|#|$)</pattern>\n  <substitution>$4</substitution>\n</regex>\n\n<!-- changes default pages into standard for /index.html, etc. into / -->\n<!-- these are commented in the default file but uncommented here for testing -->\n<regex>\n  <pattern>/((?i)index|default)\\.((?i)js[pf]{1}?[afx]?|cgi|cfm|asp[x]?|[psx]?htm[l]?|php[3456]?)(\\?|&amp;|#|$)</pattern>\n  <substitution>/$3</substitution>\n</regex> \n\n<!-- removes interpage href anchors such as site.com#location -->\n<regex>\n  <pattern>#.*?(\\?|&amp;|$)</pattern>\n  <substitution>$1</substitution>\n</regex>\n\n<!-- cleans ?&var=value into ?var=value -->\n<regex>\n  <pattern>\\?&amp;</pattern>\n  <substitution>\\?</substitution>\n</regex>\n\n<!-- cleans multiple sequential ampersands into a single ampersand -->\n<regex>\n  <pattern>&amp;{2,}</pattern>\n  <substitution>&amp;</substitution>\n</regex>\n\n<!-- removes trailing ?, ampersands, . -->\n<regex>\n  <pattern>[\\?&amp;\\.]$</pattern>\n  <substitution></substitution>\n</regex>\n\n<!-- normalize file:/// protocol prefix: -->\n<!--  keep one single slash (NUTCH-1483) -->\n<regex>\n  <pattern>^file://+</pattern>\n  <substitution>file:/</substitution>\n</regex>\n\n<!-- removes duplicate slashes but -->\n<!-- * allow 2 slashes after colon \':\' (indicating protocol) -->\n<regex>\n  <pattern>(?&lt;!:)/{2,}</pattern>\n  <substitution>/</substitution>\n</regex>\n\n</regex-normalize>\n\n'

DEFAULT_TEST = '# test simple removal of session id, keeping parameters before and after\nhttp://foo.com/foo.php?PHPSESSID=cdc993a493e899bed04f4d0c8a462a03 http://foo.com/foo.php\nhttp://foo.com/foo.php?f=2&PHPSESSID=cdc993a493e899bed04f4d0c8a462a03 http://foo.com/foo.php?f=2\nhttp://foo.com/foo.php?f=2&PHPSESSID=cdc993a493e899bed04f4d0c8a462a03&q=3 http://foo.com/foo.php?f=2&q=3\nhttp://foo.com/foo.php?PHPSESSID=cdc993a493e899bed04f4d0c8a462a03&f=2 http://foo.com/foo.php?f=2\n\n# test removal of different session ids including removal of ; in jsessionid\nhttp://www.foo.com/foo.php?Bv_SessionID=fassassddsajkl http://www.foo.com/foo.php\nhttp://www.foo.com/foo.php?Bv_SessionID=fassassddsajkl&x=y http://www.foo.com/foo.php?x=y\nhttp://www.foo.com/foo.html;jsessionid=1E6FEC0D14D044541DD84D2D013D29ED http://www.foo.com/foo.html\nhttp://www.foo.com/foo.html?param=1&another=2;jsessionid=1E6FEC0D14D044541DD84D2D013D29ED http://www.foo.com/foo.html?param=1&another=2\nhttp://www.foo.com/foo.html;jsessionid=1E6FEC0D14D044541DD84D2D013D29ED?param=1&another=2 http://www.foo.com/foo.html?param=1&another=2\nhttp://www.foo.com/foo.php?&x=1&sid=xyz&something=1 http://www.foo.com/foo.php?x=1&something=1\nhttp://www.foo.com/foo.html?_sessionID=824A6C0A13a7e11205wxN28F44E3 http://www.foo.com/foo.html\nhttp://www.foo.com/foo.php?_sessionid=qmyrcedt&outputformat=html&path=/3_images/foo http://www.foo.com/foo.php?outputformat=html&path=/3_images/foo\nhttp://www.foo.com/foo.php?_pid=2&_spid=0&lang=en&_sessionid=e36902d5bb2d0d922fc24b43 http://www.foo.com/foo.php?_pid=2&_spid=0&lang=en\nhttp://www.foo.com/foo.php?app=content&content=overview&lang=en&_sid=587fba8f825b05844526519fdb7d75c8&b=35&m=47 http://www.foo.com/foo.php?app=content&content=overview&lang=en&b=35&m=47\n# but NewsId (and similar) is not a session id (NUTCH-706, NUTCH-1328)\nhttp://www.foo.com/fa/newsdetail.aspx?NewsID=1567539 http://www.foo.com/fa/newsdetail.aspx?NewsID=1567539\nhttp://www.foo.com/home.cfm?language=en&country=uk&addressid=250646&pagingpos=0 http://www.foo.com/home.cfm?language=en&country=uk&addressid=250646&pagingpos=0\n\n# test removal default pages\nhttp://www.foo.com/home/index.html http://www.foo.com/home/\nhttp://www.foo.com/index.html http://www.foo.com/\nhttp://www.foo.com/index.htm http://www.foo.com/\nhttp://www.foo.com/index.asp http://www.foo.com/\nhttp://www.foo.com/index.aspx http://www.foo.com/\nhttp://www.foo.com/index.php http://www.foo.com/\nhttp://www.foo.com/index.php3 http://www.foo.com/\nhttp://www.foo.com/default.html http://www.foo.com/\nhttp://www.foo.com/default.htm http://www.foo.com/\nhttp://www.foo.com/default.asp http://www.foo.com/\nhttp://www.foo.com/default.aspx http://www.foo.com/\nhttp://www.foo.com/default.php http://www.foo.com/\nhttp://www.foo.com/default.php3 http://www.foo.com/\nhttp://www.foo.com/something.php3 http://www.foo.com/something.php3\nhttp://www.foo.com/something.html http://www.foo.com/something.html\nhttp://www.foo.com/something.asp http://www.foo.com/something.asp\nhttp://www.foo.com/index.phtml http://www.foo.com/\nhttp://www.foo.com/index.cfm http://www.foo.com/\nhttp://www.foo.com/index.cgi http://www.foo.com/\nhttp://www.foo.com/index.HTML http://www.foo.com/\nhttp://www.foo.com/index.Htm http://www.foo.com/\nhttp://www.foo.com/index.ASP http://www.foo.com/\nhttp://www.foo.com/index.jsp http://www.foo.com/\nhttp://www.foo.com/index.jsf http://www.foo.com/\nhttp://www.foo.com/index.jspx http://www.foo.com/\nhttp://www.foo.com/index.jspfx http://www.foo.com/index.jspfx\nhttp://www.foo.com/index.jspa http://www.foo.com/\nhttp://www.foo.com/index.jsps http://www.foo.com/index.jsps\nhttp://www.foo.com/index.aspX http://www.foo.com/\nhttp://www.foo.com/index.PhP http://www.foo.com/\nhttp://www.foo.com/index.PhP4 http://www.foo.com/\nhttp://www.foo.com/default.HTml http://www.foo.com/\nhttp://www.foo.com/default.HTm http://www.foo.com/\nhttp://www.foo.com/default.ASp http://www.foo.com/\nhttp://www.foo.com/default.AspX http://www.foo.com/\nhttp://www.foo.com/default.PHP http://www.foo.com/\nhttp://www.foo.com/default.PHP3 http://www.foo.com/\nhttp://www.foo.com/index.phtml http://www.foo.com/\nhttp://www.foo.com/index.cfm http://www.foo.com/\nhttp://www.foo.com/index.cgi http://www.foo.com/\n\n# ensure keeping non-default pages\nhttp://www.foo.com/foo.php3 http://www.foo.com/foo.php3\nhttp://www.foo.com/foo.html http://www.foo.com/foo.html\nhttp://www.foo.com/foo.asp http://www.foo.com/foo.asp\n\n# test removal of interpage anchors and keeping query string\nhttp://www.foo.com/foo.html#something http://www.foo.com/foo.html\nhttp://www.foo.com/foo.html#something?x=y http://www.foo.com/foo.html?x=y\n\n# test general cleaning of bad urls\nhttp://www.foo.com/foo.html?&x=y http://www.foo.com/foo.html?x=y\nhttp://www.foo.com/foo.html?x=y&&&z=a http://www.foo.com/foo.html?x=y&z=a\nhttp://www.foo.com/foo.html? http://www.foo.com/foo.html\n\n# remove double slashes but keep 2 slashes after protocol\nhttp://www.foo.com//path//foo.html http://www.foo.com/path/foo.html\nhttps://www.foo.com//path//foo.html https://www.foo.com/path/foo.html\n\n# normalize file: protocol prefix (keep one slash)\nfile:///path//foo.html file:/path/foo.html\nfile:/path//foo.html file:/path/foo.html\n'

SCOPE1_XML = '<?xml version="1.0"?>\n<!-- This is the configuration file for the RegexUrlNormalize Class.\n     This is intended so that users can specify substitutions to be\n     done on URLs using the Java regex syntax, see\n     https://docs.oracle.com/javase/8/docs/api/java/util/regex/Pattern.html\n     The rules are applied to URLs in the order they occur in this file.  -->\n\n<!-- WATCH OUT: an xml parser reads this file an ampersands must be\n     expanded to &amp; -->\n\n<!--\n     The following rules show how to reduce urls so that\n     urls from the same domain are identical. This is useful\n     e.g. when calculating host counts, or splitting fetchlists.\n-->\n<regex-normalize>\n<regex>\n  <pattern>(^[a-z]{3,5}://)([\\w]+\\.)*?(\\w+\\.\\w+)[/$].*</pattern>\n  <substitution>$1$3/</substitution>\n</regex>\n</regex-normalize>\n\n'

SCOPE1_TEST = '# test removal of subdomains\nhttp://www.foo.bar.com/ http://bar.com/\n\n# test removal of url path\nhttp://www.foo.bar.com/foo.php?PHPSESSID=cdc993a493e899bed04f4d0c8a462a03 http://bar.com/\n\n# test removal of urls in arguments\nhttps://www.foo.bar.com/foo.php?url=http://www.example.com/test.php https://bar.com/\n'


def matrix(text):
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        url, expected = line.split()
        out.append((url, expected))
    return out


@pytest.mark.parametrize("url,expected", matrix(DEFAULT_TEST))
def test_default_scope_rules(url, expected):
    norm = RegexNormalizer.from_xml(DEFAULT_XML)
    assert norm(url) == expected


@pytest.mark.parametrize("url,expected", matrix(SCOPE1_TEST))
def test_scope1_rules(url, expected):
    norm = RegexNormalizer.from_xml(SCOPE1_XML)
    assert norm(url) == expected


def test_scoped_chain_dispatch():
    """URLNormalizers per-scope overrides route to the scope's rule set
    (TestRegexURLNormalizer.testNormalizerScope)."""
    chain = URLNormalizers(
        names=(RegexNormalizer.from_xml(DEFAULT_XML),),
        scope_overrides={"scope1": (RegexNormalizer.from_xml(SCOPE1_XML),)},
    )
    assert (
        chain.normalize("http://www.foo.bar.com/", scope="scope1")
        == "http://bar.com/"
    )
    # default scope leaves subdomains alone
    assert (
        chain.normalize("http://www.foo.bar.com/", scope="default")
        == "http://www.foo.bar.com/"
    )


def test_rule_parser_shape():
    rules = parse_regex_normalize_xml(DEFAULT_XML)
    assert len(rules) == 8
    # Java $N group refs converted to Python backrefs
    assert rules[0][1].endswith("\\4") or "\\4" in rules[0][1]
