"""F5 differential gate (VERDICT r1 'What's missing' #5): measure the
classifier's agreement on a labeled synthetic UA corpus instead of
assuming parity with the reference's (uncopied) 173-pattern data file.

The corpus draws one or more examples from every semantic CLASS the
reference's pattern file covers — named crawlers, generic bot/crawl
morphology, HTTP client libraries & scripting runtimes, feed/news
readers, monitoring agents, API tools, degenerate/bare-token UA shapes
— plus hard negatives the reference explicitly guards against (cubot
phones, Google Pixel devices, browsers whose tokens look bot-ish).
Examples are written from public UA knowledge, not copied from the
file. The gate: 100% on hard negatives (a human must never be
dropped silently) and >=95% recall on the bot side, reported per
class so a future pattern edit shows exactly which class regressed."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dwds_livestream_spark.functions.bots import is_bot

CHROME = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"
)

# class -> bot-labeled examples
BOT_CORPUS: dict[str, list[str]] = {
    "named-crawler": [
        "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
        "Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)",
        "Mozilla/5.0 (compatible; YandexBot/3.0; +http://yandex.com/bots)",
        "Mozilla/5.0 (compatible; Baiduspider/2.0; +http://www.baidu.com/search/spider.html)",
        "DuckDuckBot/1.0; (+http://duckduckgo.com/duckduckbot.html)",
        "Mozilla/5.0 (compatible; SemrushBot/7~bl; +http://www.semrush.com/bot.html)",
        "Mozilla/5.0 (compatible; AhrefsBot/7.0; +http://ahrefs.com/robot/)",
        "Mozilla/5.0 (compatible; MJ12bot/v1.4.8; http://mj12bot.com/)",
        "Mozilla/5.0 (compatible; PetalBot;+https://webmaster.petalsearch.com/site/petalbot)",
        "Mozilla/5.0 (compatible; Bytespider; spider-feedback@bytedance.com)",
        "facebookexternalhit/1.1 (+http://www.facebook.com/externalhit_uatext.php)",
        "Twitterbot/1.0",
        "Slackbot-LinkExpanding 1.0 (+https://api.slack.com/robots)",
        "WhatsApp/2.19.81 A",
        "Mozilla/5.0 (compatible; GPTBot/1.2; +https://openai.com/gptbot)",
        "CCBot/2.0 (https://commoncrawl.org/faq/)",
        "Mozilla/5.0 (compatible; Applebot/0.1; +http://www.apple.com/go/applebot)",
    ],
    "generic-morphology": [
        "SomeNewCo-bot/0.9 (+https://somenew.co)",
        "WebCrawler/3.0 experimental",
        "data-spider v2",
        "SiteScraper/1.1",
        "MyArchiver/2.0",
        "link-indexer (beta)",
    ],
    "http-library": [
        "curl/8.4.0",
        "Wget/1.21.4",
        "python-requests/2.31.0",
        "Python-urllib/3.11",
        "aiohttp/3.9.1",
        "okhttp/4.12.0",
        "Java/17.0.9",
        "Apache-HttpClient/5.2.1 (Java/17.0.8)",
        "Go-http-client/2.0",
        "node-fetch/1.0 (+https://github.com/bitinn/node-fetch)",
        "axios/1.6.2",
        "libwww-perl/6.72",
        "Ruby",
        "PHP/8.2.12",
        "python/3.11 aiohttp",
    ],
    "api-tool": [
        "PostmanRuntime/7.36.0",
        "insomnia/8.4.5",
        "HTTPie/3.2.2",
    ],
    "feed-reader": [
        "Feedfetcher-Google; (+http://www.google.com/feedfetcher.html)",
        "NewsBlur Feed Fetcher - 5 subscribers",
        "RSS Reader 1.0",
        "Tiny Tiny RSS/21.11 (http://tt-rss.org/)",
        "FreshRSS/1.21.0 (Linux; https://freshrss.org)",
    ],
    "monitoring": [
        "Pingdom.com_bot_version_1.4_(http://www.pingdom.com/)",
        "UptimeRobot/2.0 (http://www.uptimerobot.com/)",
        "Site24x7",
        "StatusCake_Pagespeed_indev",
        "updown.io daemon 2.2",
    ],
    "headless-automation": [
        "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) "
        "HeadlessChrome/119.0.6045.105 Safari/537.36",
        "Mozilla/5.0 (Unknown; Linux x86_64) AppleWebKit/534.34 (KHTML, like Gecko) "
        "PhantomJS/2.1.1 Safari/534.34",
        "Mozilla/5.0 selenium/4.15 (grid node)",
    ],
    "degenerate-shape": [
        "<?php echo 'ua'; ?>",
        "12345",
        "x" * 60,
        "() { :; }; /bin/bash -c 'id'",
        "Mozilla/5.0",
        "-",
        "",
        "admin@scanner-host.example",
        "Mozilla/4.0 (compatible;)",
    ],
}

# hard negatives: UAs the reference's guards deliberately keep human
HUMAN_CORPUS: list[str] = [
    CHROME,
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.1 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1_2 like Mac OS X) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.1.2 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.6099.43 Mobile Safari/537.36",
    # the reference's lookbehind guard case: CUBOT is a phone brand
    "Mozilla/5.0 (Linux; Android 11; CUBOT KINGKONG 5) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/92.0.4515.131 Mobile Safari/537.36",
    "Mozilla/5.0 (Linux; Android 10; Cubot X30) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/88.0.4324.181 Mobile Safari/537.36",
    "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/119.0",
    "Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
    "Opera/9.80 (Windows NT 6.0) Presto/2.12.388 Version/12.14",
    "Mozilla/5.0 (Android 14; Mobile; rv:121.0) Gecko/121.0 Firefox/121.0",
    "Mozilla/5.0 (PlayStation 5/SmartTV) AppleWebKit/605.1.15 (KHTML, like Gecko)",
    "Mozilla/5.0 (Nintendo Switch; WifiWebAuthApplet) AppleWebKit/606.4 "
    "(KHTML, like Gecko) NF/6.0.1.15.4 NintendoBrowser/5.1.0.20393",
]


@pytest.fixture(scope="module")
def classify(spark):
    def run(uas: list[str]) -> list[bool]:
        df = spark.createDataFrame([(u,) for u in uas], "ua string")
        rows = df.select("ua", is_bot(F.col("ua")).alias("b")).collect()
        by_ua = {r.ua: r.b for r in rows}
        return [by_ua[u] for u in uas]

    return run


def test_no_false_positives_on_hard_negatives(classify):
    flags = classify(HUMAN_CORPUS)
    wrongly_botted = [u for u, b in zip(HUMAN_CORPUS, flags) if b]
    assert not wrongly_botted, f"humans flagged as bots: {wrongly_botted}"


def test_bot_recall_per_class(classify):
    report: dict[str, str] = {}
    misses: dict[str, list[str]] = {}
    total = hit = 0
    for cls, uas in BOT_CORPUS.items():
        flags = classify(uas)
        got = sum(flags)
        report[cls] = f"{got}/{len(uas)}"
        missed = [u for u, b in zip(uas, flags) if not b]
        if missed:
            misses[cls] = missed
        total += len(uas)
        hit += got
    recall = hit / total
    # the documented agreement number; per-class detail on failure
    assert recall >= 0.95, f"bot recall {recall:.3f}; report={report}; misses={misses}"
    # every class must be at least partially covered — a zero row means
    # a whole reference pattern class has no counterpart here
    zero = [c for c, r in report.items() if r.startswith("0/")]
    assert not zero, f"uncovered classes: {zero}"


# one positive example per BOT_PATTERNS branch, exercising the GUARDED
# path of the two-tier is_bot (r12): if a guard literal were missing
# for a branch, its example would flip to non-bot and the equivalence
# test below would fail on exactly that string.
PER_BRANCH_POSITIVES = [
    "MegaBot 2.0",                      # bots? morphology
    "site crawling agent",              # crawl(er|ing)?
    "dark-spider",                      # spider
    "page scraper v1",                  # scrap(er|ing)
    "SuperHttpClient/2",                # https?(lib|client|get)
    "async fetch agent",                # fetch(er)?
    "Yahoo! Slurp",                     # slurp
    "WebArchiver",                      # archiver?
    "page indexer daemon",              # index(er|ing)
    "curl/7.88",                        # ^curl/
    "Wget/1.20",                        # ^wget/
    "python-requests/2.31",             # python-requests/
    "Python-urllib/3.9",                # python-urllib
    "client aiohttp/3.8",               # aiohttp
    "PHP/8.1",                          # ^php/?d
    "app okhttp/4.9",                   # okhttp
    "Java/17.0.1",                      # ^java/?d
    "Apache-HttpClient/4.5",            # apache-httpclient
    "Go-http-client/2.0",               # go-http-client
    "app node-fetch/2.6",               # node-fetch
    "lib axios/1.4",                    # axios/
    "Ruby",                             # ^ruby
    "libwww-perl/6.05",                 # libwww-perl
    "Perl LWP",                         # ^perl
    "Mediapartners-Google",             # google platform alternation
    "Mozilla/5.0 BingPreview/1.0b",     # bingpreview
    "Mozilla/5.0 (compatible; YandexMetrika/2.0)",  # yandex...
    "Baiduspider-image+",               # baiduspider
    "DuckDuckGo/5 Mobile",              # duckduck(go|bot)
    "Applebot/0.1",                     # applebot
    "meta-externalagent/1.1",           # facebookexternalhit|meta-...
    "Twitterbot/1.0",                   # twitterbot
    "LinkedInBot/1.0",                  # linkedinbot
    "Slackbot 1.0",                     # slackbot
    "TelegramBot (like TwitterBot)",    # telegrambot
    "WhatsApp/2.21",                    # whatsapp
    "Pinterest/0.2",                    # pinterest(bot)?
    "SemrushBot-SA",                    # semrush
    "AhrefsSiteAudit",                  # ahrefs
    "MJ12bot/v1.4",                     # mj12
    "DotBot/1.2",                       # dotbot
    "PetalBot",                         # petalbot
    "Bytespider",                       # bytespider
    "ChatGPT-User/1.0",                 # gptbot|oai-searchbot|chatgpt
    "Claude-Web/1.0",                   # claude(bot|-web)
    "CCBot/2.0",                        # ccbot
    "Amazonbot/0.1",                    # amazonbot
    "HeadlessChrome/119.0",             # headlesschrome
    "PhantomJS/2.1.1",                  # phantomjs
    "selenium webdriver",               # selenium
    "Playwright/1.38",                  # playwright
    "Puppeteer/21.0",                   # puppeteer
    "PostmanRuntime/7.32",              # ^postman
    "insomnia/2023.4",                  # ^insomnia/
    "HTTPie/3.2",                       # ^httpie/
    "Pingdom.com_bot_version_1.4",      # pingdom
    "UptimeRobot/2.0",                  # uptimerobot
    "StatusCake",                       # statuscake
    "Site24x7",                         # site24x7
    "FeedFetcher-Google",               # feed(fetcher|...)
    "my rss reader",                    # rss
    "collectd daemon",                  # daemon
    "W3C_Validator/1.3",                # w3c_validator
    "uptime monitoring probe",          # monitor(ing)?
    "link preview generator",           # preview
]

# positives for every STRUCTURAL branch (the unguarded tier)
STRUCTURAL_POSITIVES = [
    "<?php echo 1 ?>",                  # ^<
    "12345 scanner",                    # ^\d+\b
    "x" * 60,                           # ^[^\s]{50,}$
    "Mozilla/5.0 () AppleWebKit",       # \(\)
    "Mozilla/4.0",                      # ^mozilla/d.d$
    "Mozilla/4.0 (compatible;)",        # ^mozilla/d.d (compatible;?)$
    "",                                 # ^-?$ (empty)
    "-",                                # ^-?$
    "contact@example-corp.net",         # @[a-z][\w-]+\.
]


def test_two_tier_matches_plain_alternation(spark):
    """The two-tier is_bot (guard literals + structural tier) must be
    EXTENSIONALLY IDENTICAL to the plain 68-branch alternation it
    replaced — per branch, on the labeled corpus, and on fuzz."""
    from dwds_livestream_spark.functions.bots import BOT_PATTERN

    import random

    rng = random.Random(0xB07)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 ();/._-+@<>\"'"
    )
    fuzz = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
        for _ in range(500)
    ]
    corpus = (
        PER_BRANCH_POSITIVES
        + STRUCTURAL_POSITIVES
        + HUMAN_CORPUS
        + [u for uas in BOT_CORPUS.values() for u in uas]
        + ["Mediascope cubot test", "my cubot phone", "liBhttps tool"]
        + fuzz
    )
    df = spark.createDataFrame([(u,) for u in corpus] + [(None,)], "ua string")
    rows = df.select(
        "ua",
        is_bot(F.col("ua")).alias("two_tier"),
        F.coalesce(F.col("ua").rlike(BOT_PATTERN), F.lit(True)).alias(
            "plain"
        ),
    ).collect()
    diff = [(r.ua, r.two_tier, r.plain) for r in rows if r.two_tier != r.plain]
    assert not diff, f"two-tier != plain alternation on: {diff[:10]}"
    # and every crafted positive really is a positive (guards work)
    flagged = {r.ua: r.plain for r in rows}
    missed = [
        u
        for u in PER_BRANCH_POSITIVES + STRUCTURAL_POSITIVES
        if not flagged[u]
    ]
    assert not missed, f"crafted branch positives not matched: {missed}"
