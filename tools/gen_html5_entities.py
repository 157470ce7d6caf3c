#!/usr/bin/env python3
"""Export the WHATWG HTML5 named-character-reference table from the Python
stdlib (html.entities.html5 — public spec data, the exact table
html.unescape and therefore bs4/html.parser resolve against) as a TSV
resource for the Scala mirror (graft.etl.HtmlUnescape).

Format: one `name<TAB>value` pair per line, name exactly as in the dict
(entries appear both with and without the trailing ';' — the ';'-less
subset IS the spec's legacy no-semicolon list, so the Scala side needs no
separate legacy table). Values are unicode-escaped (\\uXXXX) so the file
is pure ASCII and survives any editor/git setting.
"""
import html.entities
import os

out = os.path.join(os.path.dirname(__file__), '..',
                   'src', 'main', 'resources', 'graft', 'html5_entities.tsv')
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, 'w', encoding='ascii') as f:
    for name, value in sorted(html.entities.html5.items()):
        esc = ''.join('\\u%04x' % ord(c) if (ord(c) > 126 or c in '\\\t\n\r')
                      else c for c in value)
        f.write('%s\t%s\n' % (name, esc))
print('wrote', out, len(html.entities.html5), 'entries')
