"""Bot / crawler user-agent classifier (F5 in SURVEY.md §2.2).

The reference classifies a user agent as a bot when it matches any of
173 Java-dialect regexes OR-joined into one pattern
(reference: src/dwds/livestream/access_log.clj:62-64, 74-76;
src/dwds/livestream/bot-patterns.txt:1-173). The pattern set below is
our own, covering the same semantic classes the reference's list covers
(named crawlers, generic bot/crawler/spider morphology with lookaround
guards, HTTP client libraries, monitoring agents, bare-token and
degenerate UA shapes) without copying the data file. Java and Spark
``rlike`` share the java.util.regex dialect, so lookbehind/lookahead
constructs behave identically.

At scale the single alternation is compiled once per task by the JVM;
the cheap structural guards (F1 substring pre-filter) run first so the
regex only sees candidate lines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# One regex per line, OR-joined — same construction as the reference.
BOT_PATTERNS: tuple[str, ...] = (
    # generic bot morphology; lookbehind guard mirrors the reference's
    # `(?<!\scu)bots?(?:\b|_)` trick (don't flag "Mediascope cubot").
    r"(?i)(?<!\scu)bots?(?:\b|_)",
    r"(?i)crawl(?:er|ing)?\b",
    r"(?i)spider",
    r"(?i)scrap(?:er|ing)\b",
    r"(?i)(?<!lib)https?(?:lib|client|[ _-]?get)",
    r"(?i)\bfetch(?:er)?\b",
    r"(?i)\bslurp\b",
    r"(?i)archiver?\b",
    r"(?i)\bindex(?:er|ing)\b",
    # HTTP client libraries / scripting runtimes
    r"(?i)^curl/",
    r"(?i)^wget/",
    r"(?i)python-requests/",
    r"(?i)python-urllib",
    r"(?i)\baiohttp\b",
    r"(?i)^php/?\d",
    r"(?i)\bokhttp\b",
    r"(?i)^java/?\d",
    r"(?i)apache-httpclient",
    r"(?i)\bgo-http-client\b",
    r"(?i)\bnode-fetch\b",
    r"(?i)\baxios/",
    r"(?i)^ruby\b",
    r"(?i)libwww-perl",
    r"(?i)^perl\b",
    # named crawlers / platforms
    r"(?i)googlebot|adsbot|mediapartners-google|apis-google",
    r"(?i)bingpreview",
    r"(?i)yandex(?:bot|images|metrika)?",
    r"(?i)baiduspider",
    r"(?i)duckduck(?:go|bot)",
    r"(?i)applebot",
    r"(?i)facebookexternalhit|meta-externalagent",
    r"(?i)twitterbot",
    r"(?i)linkedinbot",
    r"(?i)slackbot",
    r"(?i)telegrambot",
    r"(?i)whatsapp",
    r"(?i)pinterest(?:bot)?",
    r"(?i)semrush",
    r"(?i)ahrefs",
    r"(?i)mj12",
    r"(?i)dotbot",
    r"(?i)petalbot",
    r"(?i)bytespider",
    r"(?i)gptbot|oai-searchbot|chatgpt-user",
    r"(?i)claude(?:bot|-web)",
    r"(?i)ccbot",
    r"(?i)amazonbot",
    r"(?i)headlesschrome",
    r"(?i)phantomjs",
    r"(?i)selenium",
    r"(?i)playwright",
    r"(?i)puppeteer",
    # API development / testing tools
    r"(?i)^postman",
    r"(?i)^insomnia/",
    r"(?i)^httpie/",
    # monitoring / feed / preview agents
    r"(?i)pingdom|uptimerobot|statuscake|site24x7",
    r"(?i)feed(?:fetcher|parser|burner|validator)",
    r"(?i)rss\b",
    r"(?i)\bdaemon\b",
    r"(?i)w3c_validator",
    r"(?i)\bmonitor(?:ing)?\b",
    r"(?i)preview\b",
    # degenerate UA shapes (reference: ^<, ^\d+\b, ^[^\s]{50,}$, \(\))
    r"^<",
    r"^\d+\b",
    r"^[^\s]{50,}$",
    r"\(\)",
    r"(?i)^mozilla/\d\.\d$",
    r"(?i)^mozilla/\d\.\d\s\(compatible;?\)$",
    r"^-?$",
    r"@[a-z][\w-]+\.",
)

BOT_PATTERN: str = "|".join(BOT_PATTERNS)


def is_bot(user_agent: Column) -> Column:
    """Boolean column: does the UA match the bot alternation?

    Null UAs are treated as bots (an absent UA in the reference's parse
    cannot reach the filter; here we fail closed).
    """
    return F.coalesce(user_agent.rlike(BOT_PATTERN), F.lit(True))
