"""Monitor HTML presentation layer — the page-rendering half of
/root/reference/src/monitor/mod.rs, closing the one SURVEY §3.3 item
previously declared out of engine scope:

* stop page        — generate_stop_page        (mod.rs:426-591)
* trip page        — generate_trip_page        (mod.rs:691-800)
* breadcrumbs      — generate_breadcrumbs      (mod.rs:626-689)
* timeline + bars  — generate_timeline(_labels)(mod.rs:591-624)
* departure rows   — write_departure_output    (mod.rs:855-1015)
* walk first line  — write_walk_arrival_output (mod.rs:800-855)
* source bubble    — get_source_area           (mod.rs:1034-1080)
* type bubble      — the RouteType match       (mod.rs:894-922)
* search page/form — generate_search_page      (mod.rs:230-330)
* autocomplete     — generate_autocomplete     (mod.rs:198-226)
* URL scheme       — handle_request / JourneyData::parse_journey
                     (mod.rs:139-190, journey_data.rs:183-208)

The engine half (S8-S11, F8-F12, J6/J8, W3, C13-C15) lives in
``plans/monitor.py`` / ``plans/journey.py``; this module renders their
outputs.  Rendering is deliberately driver-side: one page is O(board
size) rows — the reference renders per HTTP request from MySQL reads
the same way, and nothing here touches more than the one stop's
window of predictions (the heavy filtering ran distributed in
``departure_board``).  Pure stdlib: html.escape, urllib-style percent
encoding, base64 PNG data URLs via :mod:`rendering`.
"""

from __future__ import annotations

import datetime as dt
import html as _html
import re

__all__ = [
    "format_delay", "format_duration", "type_bubble", "source_area",
    "route_type_to_str", "path_quote", "journey_url",
    "parse_journey_path", "board_window", "breadcrumbs_html",
    "timeline_html", "departure_row_html", "walk_arrival_row_html",
    "stop_page_html", "trip_page_html", "trip_stop_row_html",
    "search_page_html", "autocomplete_json", "error_page_html",
    "STYLE_CSS", "german_date",
]

_esc = _html.escape


# -- C17 formatting twins (mod.rs:1174-1190) ------------------------------

def format_delay(minutes: int) -> str:
    """'+N' for positive delays, bare number otherwise."""
    m = int(minutes)
    return f"+{m}" if m > 0 else str(m)


def format_duration(seconds: int) -> str:
    """'N Sek.' under a minute, else 'M:SS Min.'."""
    s = int(seconds)
    if s < 60:
        return f"{s} Sek."
    return f"{s // 60}:{s % 60:02d} Min."


# -- C18 display strings (mod.rs:894-922, 1666-1681) ----------------------

# GTFS route_type → the reference's RouteType German display string
_ROUTE_TYPE_STR = {
    0: "Tram", 1: "U-Bahn", 2: "Zug", 3: "Bus", 4: "Fähre",
    5: "Kabelbahn", 6: "Seilbahn", 7: "Standseilbahn",
    200: "Reisebus", 1100: "Flugzeug", 1500: "Taxi",
}
_ROUTE_TYPE_FROM_STR = {v: k for k, v in _ROUTE_TYPE_STR.items()}


def route_type_to_str(route_type: int) -> str:
    return _ROUTE_TYPE_STR.get(int(route_type), "Fahrzeug")


def type_bubble(route_type: int, route_name: str) -> tuple[str, str]:
    """(letter, css class) for the vehicle-type bubble.  Rail names are
    classified by prefix (RB/RE/S/RS/IC) exactly like the reference's
    match arms — checked in the same order, so e.g. 'RS1' hits the RS
    arm because it does not start with 'S'."""
    rt, name = int(route_type), route_name or ""
    if rt in (3, 200):
        return "Bus", "b"
    if rt == 2:
        for prefix, out in (("RB", ("RB", "r")), ("RE", ("RE", "r")),
                            ("S", ("S", "s")), ("RS", ("RS", "s")),
                            ("IC", ("IC", "r"))):
            if name.startswith(prefix):
                return out
        return "Bahn", "z"
    return {
        1: ("U", "u"), 0: ("Tram", "m"), 4: ("F", "f"),
        5: ("Seil", "c"), 6: ("Seil", "c"), 7: ("Seil", "c"),
        1100: ("Flug", "a"), 1500: ("Taxi", "t"),
    }.get(rt, ("?", "d"))


# -- source bubble (mod.rs:1034-1080) --------------------------------------

_ORIGIN_LETTER = {
    # (origin_type, precision is Specific/FallbackSpecific?) → letter
    (1, True): ("E", "Aktuelle Echtzeitdaten"),
    (1, False): ("U", "Ungenutzte Echtzeitdaten"),
    (2, None): ("P", "Fahrplandaten"),
    (0, None): ("?", "Unbekannte Datenquelle"),
}
_PRECISION_LETTER = {
    1: ("S+", "Spezifische Prognose für diese Linie, Haltestelle und Tageszeit"),
    2: ("S", "Spezifische Prognose für diese Linie und Haltestelle"),
    3: ("S-", "Spezifische Prognose für diese Linie und Haltestelle, jedoch ohne Echtzeitdaten zu nutzen"),
    4: ("G+", "Generelle Prognose für Fahrzeugart, Tageszeit und Routenabschnitt"),
    5: ("G", "Generelle Prognose für Fahrzeugart"),
    6: ("G-", "Standardprognose, sehr ungenau"),
    0: ("?", "Unbekanntes Prognoseverfahren"),
}
_SOURCE_CLASS = {
    ("E", "S+"): "a", ("E", "S"): "a",
}
_PRECISION_CLASS = {"S+": "b", "S": "b", "S-": "b", "G+": "c",
                    "G": "d", "G-": "d"}


def source_area(origin_type: int | None, precision_type: int | None,
                sample_size: int | None) -> str:
    """The 'Daten' column bubble: origin letter / precision letter with
    a tooltip carrying the long descriptions and the sample size."""
    if origin_type is None:
        return ('<div class="area source" title="Keine Prognose verfügbar">'
                '<span class="bubble e">-</span></div>')
    prec, prec_desc = _PRECISION_LETTER.get(int(precision_type or 0),
                                            _PRECISION_LETTER[0])
    key = (int(origin_type),
           (prec in ("S+", "S")) if int(origin_type) == 1 else None)
    origin, origin_desc = _ORIGIN_LETTER.get(key, _ORIGIN_LETTER[(0, None)])
    cls = _SOURCE_CLASS.get((origin, prec),
                            _PRECISION_CLASS.get(prec, "e"))
    title = (f"{origin_desc} und {prec_desc}, basierend auf "
             f"{int(sample_size or 0)} vorherigen Aufnahmen.")
    return (f'<div class="area source" title="{_esc(title, quote=True)}">'
            f'<span class="bubble {cls}">{origin}/{prec}</span></div>')


# -- URL scheme (journey_data.rs:18-27, mod.rs:139-190) --------------------

# percent-encode CONTROLS ∪ {'/', '?', '"', '`'} — PATH_ELEMENT_ESCAPE
_ESCAPE_CHARS = {"/", "?", '"', "`", "%", "#"}


def path_quote(part: str) -> str:
    out = []
    for ch in part:
        if ch in _ESCAPE_CHARS or ord(ch) < 0x20 or ord(ch) == 0x7F:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
        else:
            out.append(ch)
    return "".join(out)


def path_unquote(part: str) -> str:
    from urllib.parse import unquote
    return unquote(part)


_TIME_FMT = "%d.%m.%y %H:%M"
_TRIP_PART = re.compile(r"^(\S+) (.+) nach (.+) um (\d{2}:\d{2})$")


def _trip_part(route_type: int, route_name: str, headsign: str,
               hhmm: str) -> str:
    return (f"{route_type_to_str(route_type)} {route_name} "
            f"nach {headsign} um {hhmm}")


def journey_url(start_dt: dt.datetime, components: list) -> str:
    """'/{d.m.y H:M}/{stop}/{trip|Fußweg}/…/' — the reference's pretty
    journey URLs.  ``components`` uses the journey_probabilities
    convention: stop names alternating with trip-descriptor dicts or
    the literal "walk"."""
    parts = [start_dt.strftime(_TIME_FMT)]
    for comp in components:
        if isinstance(comp, str):
            parts.append("Fußweg" if comp == "walk" else comp)
        else:
            parts.append(_trip_part(comp["route_type"],
                                    comp["route_short_name"],
                                    comp["headsign"],
                                    comp["departure_hhmm"]))
    return "/" + "/".join(path_quote(p) for p in parts) + "/"


def parse_journey_path(path: str) -> tuple[dt.datetime, list]:
    """Inverse of :func:`journey_url` (JourneyData::parse_journey):
    decode percent escapes, split into start time + components."""
    parts = [path_unquote(p) for p in path.split("/") if p]
    if not parts:
        raise ValueError("empty journey path")
    start = dt.datetime.strptime(parts[0], _TIME_FMT)
    comps: list = []
    for raw in parts[1:]:
        if raw == "Fußweg":
            comps.append("walk")
            continue
        m = _TRIP_PART.match(raw)
        if m and m.group(1) in _ROUTE_TYPE_FROM_STR:
            comps.append({
                "route_type": _ROUTE_TYPE_FROM_STR[m.group(1)],
                "route_short_name": m.group(2),
                "headsign": m.group(3),
                "departure_hhmm": m.group(4),
            })
        else:
            comps.append(raw)          # a stop name
    return start, comps


# -- board window (mod.rs:431-437) -----------------------------------------

def board_window(t01_s: int, t99_s: int) -> tuple[int, int, int]:
    """(window_start_s, window_end_s, length_minutes): start is the 1%
    arrival time rounded DOWN to a nice 5-minute mark, length is the
    1%→99% span plus 30 min, rounded down to 5."""
    start = int(t01_s) - int(t01_s) % 60            # zero the seconds
    start -= (start // 60) % 5 * 60                 # previous 5-min mark
    exact_len = (int(t99_s) - int(t01_s)) // 60 + 30
    len_min = max(5, exact_len - exact_len % 5)
    return start, start + len_min * 60, len_min


# -- German date label (the reference wants chrono_locale, mod.rs:548) ----

_DE_DAYS = ["Montag", "Dienstag", "Mittwoch", "Donnerstag", "Freitag",
            "Samstag", "Sonntag"]
_DE_MONTHS = ["Januar", "Februar", "März", "April", "Mai", "Juni", "Juli",
              "August", "September", "Oktober", "November", "Dezember"]


def german_date(d: dt.date) -> str:
    """'%A, %e. %B' with German day/month names."""
    return f"{_DE_DAYS[d.weekday()]}, {d.day}. {_DE_MONTHS[d.month - 1]}"


# -- page fragments --------------------------------------------------------

def _hhmm(epoch_s: int) -> str:
    return dt.datetime.fromtimestamp(int(epoch_s),
                                     dt.timezone.utc).strftime("%H:%M")


def _hhmmss(epoch_s: int) -> str:
    return dt.datetime.fromtimestamp(int(epoch_s),
                                     dt.timezone.utc).strftime("%H:%M:%S")


def _marker(time_s: int, lo_s: int, hi_s: int, cls: str) -> str:
    pct = (time_s - lo_s) / max(1, hi_s - lo_s) * 100.0
    return f'<div class="marker {cls}" style="left:{pct:.2f}%;"></div>'


def timeline_html(lo_s: int, len_min: int) -> str:
    """Minute tick bars (major every 5) + HH:MM labels every 5 min."""
    out = ['<div class="timeline">']
    for m in range(len_min + 1):
        pct = m / len_min * 100.0
        if m % 5 == 0:
            out.append(f'<div class="timebar" '
                       f'style="left: calc({pct:.1f}% - 1.5px);"></div>')
        elif len_min < 90:
            out.append(f'<div class="small_timebar" '
                       f'style="left: {pct:.1f}%;"></div>')
    out.append('<div class="timelabels_footer"><div class="timelabels">')
    for m in range(0, len_min + 1, 5):
        pct = m / len_min * 100.0
        out.append(f'<div class="timelabel" style="left: {pct:.1f}%;">'
                   f'<span>{_hhmm(lo_s + m * 60)}</span></div>')
    out.append("</div></div></div>")
    return "\n".join(out)


def breadcrumbs_html(start_dt: dt.datetime, components: list) -> str:
    """Search-page link + the ' ➞ '-chained journey: every prefix is a
    link back to that page, the final component a plain span.  Trips
    display '{type} {name}' when the name alone is ambiguous (bus,
    tram, or all-numeric names), like the reference."""
    out = ['<div class="breadcrumbs">'
           '<a href="/" title="Startseite">&#128269;</a>']
    for i, comp in enumerate(components):
        if isinstance(comp, str):
            text = "Fußweg" if comp == "walk" else comp
        else:
            text = comp["route_short_name"]
            if comp["route_type"] in (0, 3) or (text and text[0].isdigit()):
                text = f"{route_type_to_str(comp['route_type'])} {text}"
        if i == len(components) - 1:
            out.append(f" ➞ <span>{_esc(text)}</span>")
        else:
            url = journey_url(start_dt, components[:i + 1])
            out.append(f' ➞ <a href="{_esc(url, quote=True)}">'
                       f"{_esc(text)}</a>")
    out.append("</div>")
    return "".join(out)


def departure_row_html(dep: dict, lo_s: int, hi_s: int,
                       arrival: bool = False,
                       stop_url: str | None = None) -> str:
    """One board line (write_departure_output): timing cells, type
    bubble, route, headsign, optional walk-to-platform cell, transfer
    chance, source bubble, heat-strip background, and the four
    plan/min/median/max markers.

    ``dep`` keys: scheduled_s, t01_s, t50_s, t99_s (absolute epochs),
    route_type, route_name, headsign, prob (0-100), origin_type,
    precision_type, sample_size, strip_url; optional walk_m,
    walk_stop_name, walk_min_s, walk_max_s."""
    r01 = (dep["t01_s"] - dep["scheduled_s"]) // 60
    r50 = (dep["t50_s"] - dep["scheduled_s"]) // 60
    r99 = (dep["t99_s"] - dep["scheduled_s"]) // 60
    letter, cls = type_bubble(dep["route_type"], dep["route_name"])

    walk_info = ""
    link_url = stop_url or ""
    if dep.get("walk_m"):
        alt = dep.get("walk_stop_name", "")
        title = (f"{format_duration(dep.get('walk_min_s', 0))} bis "
                 f"{format_duration(dep.get('walk_max_s', 0))} "
                 f"Fußweg bis {alt}")
        walk_info = (f'<div class="area walk" '
                     f'title="{_esc(title, quote=True)}">'
                     f'<span>{dep["walk_m"]:.0f} m</span></div>')
        if stop_url:
            link_url = f"{stop_url}Fußweg/{path_quote(alt)}/"

    if arrival or not stop_url:
        open_tag, close_tag = "<div", "div"
    else:
        trip = _trip_part(dep["route_type"], dep["route_name"],
                          dep["headsign"], _hhmm(dep["scheduled_s"]))
        open_tag = f'<a href="{_esc(link_url + path_quote(trip), quote=True)}/"'
        close_tag = "a"

    headsign = (f"Ankunft an {dep['headsign']}" if arrival
                else dep["headsign"])
    prob = float(dep.get("prob", 100.0))
    probclass = " hundred" if prob >= 99.5 else ""
    strip = dep.get("strip_url") or ""
    visu = (f'<div class="visu" style="background-image:'
            f"url('{strip}')\"></div>" if strip else "")

    return "\n".join([
        f'{open_tag} class="outer">',
        '<div class="line">',
        '<div class="timing">',
        f'<div class="area time">{_hhmm(dep["scheduled_s"])}</div>',
        f'<div class="area min" title="Frühestens {_hhmmss(dep["t01_s"])}">'
        f"{format_delay(r01)}</div>",
        f'<div class="area med" title="Vermutlich {_hhmmss(dep["t50_s"])}">'
        f"{format_delay(r50)}</div>",
        f'<div class="area max" title="Spätestens {_hhmmss(dep["t99_s"])}">'
        f"{format_delay(r99)}</div>",
        "</div>",
        f'<div class="area type"><span class="bubble {cls}">{letter}'
        "</span></div>",
        f'<div class="area route">{_esc(dep["route_name"])}</div>',
        f'<div class="area headsign">{_esc(headsign)}</div>',
        walk_info,
        f'<div class="area prob{probclass}">{prob:.0f} %</div>',
        source_area(dep.get("origin_type"), dep.get("precision_type"),
                    dep.get("sample_size")),
        "</div>",
        visu,
        _marker(dep["scheduled_s"], lo_s, hi_s, "plan"),
        _marker(dep["t01_s"], lo_s, hi_s, "min"),
        _marker(dep["t50_s"], lo_s, hi_s, "median"),
        _marker(dep["t99_s"], lo_s, hi_s, "max"),
        f"</{close_tag}>",
    ])


def walk_arrival_row_html(stop_name: str, distance_m: float,
                          t01_s: int, t50_s: int, t99_s: int,
                          prob: float, lo_s: int, hi_s: int,
                          strip_url: str = "") -> str:
    """The optional first board line: arrival on foot
    (write_walk_arrival_output)."""
    probclass = " hundred" if prob >= 99.5 else ""
    visu = (f'<div class="visu" style="background-image:'
            f"url('{strip_url}')\"></div>" if strip_url else "")
    return "\n".join([
        '<div class="outer">',
        '<div class="line">',
        '<div class="timing">',
        f'<div class="area time" title="Mittlere Ankunftszeit: '
        f'{_hhmm(t50_s)}">{_hhmm(t50_s)}</div>',
        f'<div class="area min" title="Frühestmögliche Ankunft">'
        f"{format_delay((t01_s - t50_s) // 60)}</div>",
        f'<div class="area med" title="Mittlere Ankunft">'
        f"{format_delay(0)}</div>",
        f'<div class="area max" title="Spätestmögliche Ankunft">'
        f"{format_delay((t99_s - t50_s) // 60)}</div>",
        "</div>",
        f'<div class="area distance">{distance_m:.0f} m Fußweg</div>',
        f'<div class="area headsign">Ankunft an {_esc(stop_name)}</div>',
        f'<div class="area prob{probclass}">{prob:.0f} %</div>',
        '<div class="area source"></div>',
        "</div>",
        visu,
        "</div>",
    ])


_PAGE_HEAD = """<html>
<head>
<title>{title} | Dystonse ÖPNV-Reiseplaner</title>
<link rel="stylesheet" href="/style.css">
<meta name=viewport content="width=device-width, initial-scale=1">
</head>
<body class="monitorbody">
<a href="/help/" class="help-link">Hilfe</a>"""


def stop_page_html(stop_name: str, extended_stop_names: list[str],
                   lo_s: int, hi_s: int, len_min: int,
                   rows_html: list[str], start_dt: dt.datetime,
                   components: list) -> str:
    """The departure board page: title, breadcrumbs, H1 with window,
    column header, board lines, timeline."""
    ext = ""
    if len(extended_stop_names) > 1:
        names = ",\n".join(extended_stop_names)
        ext = (f' <span class="extended_stops" '
               f'title="{_esc(names, quote=True)}">'
               f"(und {len(extended_stop_names) - 1} weitere)</span>")
    date_label = german_date(
        dt.datetime.fromtimestamp(lo_s, dt.timezone.utc).date())
    return "\n".join([
        _PAGE_HEAD.format(title=_esc(stop_name)),
        breadcrumbs_html(start_dt, components),
        f"<h1>Abfahrten für {_esc(stop_name)}{ext}, {date_label} "
        f"von {_hhmm(lo_s)} bis {_hhmm(hi_s)}</h1>",
        '<div class="header">',
        '<div class="timing">',
        '<div class="head time" title="Abfahrt laut Fahrplan">Plan △</div>',
        '<div class="head min" title="Früheste Abfahrt, die in 99% der '
        'Fälle nicht unterschritten wird">[−</div>',
        '<div class="head med" title="Mittlere Abfahrt">○</div>',
        '<div class="head max" title="Späteste Abfahrt, die in 99% der '
        'Fälle nicht überschritten wird">+]</div>',
        "</div>",
        '<div class="head type">Typ</div>',
        '<div class="head route">Linie</div>',
        '<div class="head headsign">Ziel</div>',
        '<div class="head prob">Chance</div>',
        '<div class="head source">Daten</div>',
        "</div>",
        *rows_html,
        timeline_html(lo_s, len_min),
        "</body>\n</html>",
    ])


def trip_stop_row_html(stop_name: str, dep: dict | None, lo_s: int,
                       hi_s: int, arrival: bool, prob: float | None
                       ) -> str:
    """One stop line of the trip page (write_stop_time_output): stops
    after boarding link onward to their own stop page."""
    if arrival:
        open_tag = f'<a href="{path_quote(stop_name)}/"'
        close_tag = "a"
    else:
        open_tag, close_tag = "<div", "div"
    if dep is None:
        timing = ('<div class="timing"><div class="area time">?</div>'
                  '<div class="area min">-</div>'
                  '<div class="area med">-</div>'
                  '<div class="area max">-</div></div>')
        markers, src = "", source_area(None, None, None)
    else:
        r01 = (dep["t01_s"] - dep["scheduled_s"]) // 60
        r50 = (dep["t50_s"] - dep["scheduled_s"]) // 60
        r99 = (dep["t99_s"] - dep["scheduled_s"]) // 60
        timing = "\n".join([
            '<div class="timing">',
            f'<div class="area time">{_hhmm(dep["scheduled_s"])}</div>',
            f'<div class="area min">{format_delay(r01)}</div>',
            f'<div class="area med">{format_delay(r50)}</div>',
            f'<div class="area max">{format_delay(r99)}</div>',
            "</div>"])
        markers = "".join([
            _marker(dep["scheduled_s"], lo_s, hi_s, "plan"),
            _marker(dep["t01_s"], lo_s, hi_s, "min"),
            _marker(dep["t50_s"], lo_s, hi_s, "median"),
            _marker(dep["t99_s"], lo_s, hi_s, "max")])
        src = source_area(dep.get("origin_type"),
                          dep.get("precision_type"),
                          dep.get("sample_size"))
    prob_div = (f'<div class="area prob">{prob:.0f} %</div>'
                if prob is not None else "")
    strip = (dep or {}).get("strip_url") or ""
    visu = (f'<div class="visu" style="background-image:'
            f"url('{strip}')\"></div>" if strip else "")
    return "\n".join([
        f'{open_tag} class="outer">',
        '<div class="line">', timing,
        f'<div class="area stopname">{_esc(stop_name)}</div>',
        prob_div, src, "</div>", visu, markers,
        f"</{close_tag}>",
    ])


def trip_page_html(route_type: int, route_name: str, headsign: str,
                   lo_s: int, hi_s: int, len_min: int,
                   rows_html: list[str], start_dt: dt.datetime,
                   components: list) -> str:
    """The per-trip stop list page (generate_trip_page)."""
    rts = route_type_to_str(route_type)
    return "\n".join([
        _PAGE_HEAD.format(title=f"{_esc(rts)} Linie {_esc(route_name)}"),
        breadcrumbs_html(start_dt, components),
        f"<h1>Halte für {_esc(rts)} Linie {_esc(route_name)} nach "
        f"{_esc(headsign)}</h1>",
        '<div class="header">',
        '<div class="timing">',
        '<div class="head time" title="Abfahrt laut Fahrplan">Plan △</div>',
        '<div class="head min">[−</div>',
        '<div class="head med">○</div>',
        '<div class="head max">+]</div>',
        "</div>",
        '<div class="head stopname">Haltestelle</div>',
        '<div class="head source">Daten</div>',
        "</div>",
        *rows_html,
        timeline_html(lo_s, len_min),
        "</body>\n</html>",
    ])


def search_page_html() -> str:
    """The start page: a stop-name form posting to /stop-by-name."""
    return "\n".join([
        _PAGE_HEAD.format(title="Start"),
        '<form method="get" action="/stop-by-name">',
        '<div class="search">',
        '<label for="start"><b>Start-Haltestelle:</b></label>',
        '<input type="text" id="start" name="start" '
        'placeholder="Haltestelle eingeben…">',
        '<input type="submit" value="Abfahrten anzeigen">',
        "</div>",
        "</form>",
        "</body>\n</html>",
    ])


def autocomplete_json(names: list[str]) -> str:
    """The reference's autocomplete JSON: names then a trailing empty
    string (mod.rs:1551 generate_autocomplete)."""
    import json
    parts = "".join(f"{json.dumps(n, ensure_ascii=False)},\n"
                    for n in names)
    return f"[\n{parts}\"\"]\n"


def help_page_html() -> str:
    """The /help/ page (the reference serves a static file; this is
    the column legend the pages link to)."""
    return "\n".join([
        _PAGE_HEAD.format(title="Hilfe"),
        "<h1>Hilfe</h1>",
        "<p>Die Abfahrtstafel zeigt je Zeile: Planzeit (Plan △), die "
        "früheste Abfahrt, die in 99% der Fälle nicht unterschritten "
        "wird ([−), die mittlere Abfahrt (○) und die späteste Abfahrt, "
        "die in 99% der Fälle nicht überschritten wird (+]) — alle als "
        "Minuten relativ zum Plan.</p>",
        "<p>Der Farbstreifen unter jeder Zeile ist die "
        "Wahrscheinlichkeitsdichte der Abfahrtszeit über das "
        "Zeitfenster; die Markierungen zeigen Plan, 1%, Median und "
        "99%.</p>",
        "<p>Die Spalte <em>Daten</em> nennt Herkunft und Genauigkeit "
        "der Prognose: E = Echtzeitdaten, P = Fahrplandaten; S = "
        "spezifisch für Linie und Haltestelle, G = generell je "
        "Fahrzeugart.</p>",
        "<p>Die Spalte <em>Chance</em> ist die Wahrscheinlichkeit, "
        "diese Abfahrt zu erreichen — inklusive Fußweg und aller "
        "vorherigen Umstiege der Reise.</p>",
        "</body>\n</html>",
    ])


def error_page_html(status: int, message: str) -> str:
    return "\n".join([
        _PAGE_HEAD.format(title=f"Fehler {status}"),
        f"<h1>Fehler {status}</h1>",
        f"<p>{_esc(message)}</p>",
        "</body>\n</html>",
    ])


# A compact stand-in for the reference's static style.css (served by
# hyper-staticfile from disk; the class names match the page fragments).
STYLE_CSS = """
body.monitorbody { font-family: sans-serif; margin: 0.5em; }
.breadcrumbs { margin: 0.3em 0; }
.header, .line { display: flex; align-items: baseline; gap: 0.4em; }
.timing { display: flex; width: 12em; gap: 0.3em; }
.area.time, .head.time { width: 4em; }
.area.min, .area.med, .area.max { width: 2.2em; text-align: right; }
.area.route, .head.route { width: 5em; }
.area.type, .head.type { width: 3.5em; }
.area.headsign, .head.headsign, .area.stopname, .head.stopname { flex: 1; }
.area.prob, .head.prob { width: 4em; text-align: right; }
.area.prob.hundred { color: #2a2; }
.area.source, .head.source { width: 4em; }
.bubble { border-radius: 0.6em; padding: 0 0.4em; color: #fff; }
.bubble.b { background: #a0c; } .bubble.r { background: #888; }
.bubble.s { background: #283; } .bubble.z { background: #555; }
.bubble.u { background: #16c; } .bubble.m { background: #c22; }
.bubble.f { background: #08c; } .bubble.c { background: #777; }
.bubble.a, .bubble.t, .bubble.d { background: #999; }
.bubble.e { background: #bbb; }
.outer { display: block; position: relative; border-bottom: 1px solid #eee;
         text-decoration: none; color: inherit; }
.visu { height: 4px; background-size: 100% 100%; }
.timeline { position: relative; height: 2.2em; }
.timebar { position: absolute; top: 0; width: 3px; height: 0.8em;
           background: #888; }
.small_timebar { position: absolute; top: 0; width: 1px; height: 0.5em;
                 background: #ccc; }
.timelabels { position: relative; }
.timelabel { position: absolute; transform: translateX(-50%);
             font-size: 0.75em; }
.marker { position: absolute; bottom: 0; width: 2px; height: 6px; }
.marker.plan { background: #00f; } .marker.min { background: #8c8; }
.marker.median { background: #080; } .marker.max { background: #8c8; }
.help-link { float: right; }
.extended_stops { font-size: 0.7em; color: #666; }
"""
