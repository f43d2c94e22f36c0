"""Schema (de)serializers: LinkML dicts, arrows.app JSON, RDF/TTL.

Reference surfaces:
- ``export_model_to_linkml`` / ``create_model_from_linkml``
  (model_managers/model_manager.py:1291-1374) — LinkML dict round-trip
- ``load_arrows_dict`` (NI; call sites derivation_method.py:834,
  tests/test_dp2.py:24) — arrows.app JSON graph import
- ``export_model_ttl`` (model_manager.py:1090-1124) — RDF/TTL export

All driver-side (the schema is metadata-scale). TTL is emitted by a
deterministic template rather than rdflib (not a dependency gamble, and
the output is diffable in tests).
"""

from __future__ import annotations

from tab2neo_spark.model.metadata import MetadataModel, TermSpec

# -- LinkML ------------------------------------------------------------------


def export_model_to_linkml(model: MetadataModel) -> dict:
    """MetadataModel -> the reference's LinkML dict shape, field for field
    (model_manager.py:1291-1337; golden fixture
    tests_model_manager/test_linkml.py:11-66):

    - ``classes``: LIST ordered by label; each entry carries the non-null
      class props (label, short_label, derived, data_type) plus
      ``attributes``: one ``{alias, name, range}`` per outgoing
      relationship ordered by (range, alias), then — unless the class is
      create-mode — a final ``rdfs:label`` attribute whose range is
      '<label> CT' when the class has controlled terms, else its data_type
      (default 'string');
    - ``enums``: ``{'<label> CT': {permissible_values: {rdfs_label:
      {description: '<Codelist Code>_<Term Code>'}}}}`` for classes with
      terms; omitted entirely when empty.

    SUBCLASS_OF is not represented — the reference's export is lossy the
    same way."""
    with_ct = {t.class_label for t in model.terms}
    classes: list[dict] = []
    for label in sorted(model.classes):
        spec = model.classes[label]
        entry: dict = {"label": label}
        if spec.short_label is not None:
            entry["short_label"] = spec.short_label
        if spec.derived:
            entry["derived"] = spec.derived
        if spec.data_type is not None:
            entry["data_type"] = spec.data_type
        attrs = [
            {
                "name": f"{label} {r.relationship_type}",
                "alias": r.relationship_type,
                "range": r.to_label,
            }
            for r in sorted(
                (r for r in model.relationships if r.from_label == label),
                key=lambda r: (r.to_label, r.relationship_type),
            )
        ]
        if not spec.create:
            attrs.append({
                "name": f"{label} rdfs:label",
                "alias": "rdfs:label",
                "range": f"{label} CT" if label in with_ct
                         else (spec.data_type or "string"),
            })
        entry["attributes"] = attrs
        classes.append(entry)
    enums = {
        f"{label} CT": {
            "permissible_values": {
                t.rdfs_label: {"description": f"{t.codelist_code}_{t.term_code}"}
                for t in model.terms if t.class_label == label
            }
        }
        for label in sorted(with_ct & set(model.classes))
    }
    res: dict = {"classes": classes}
    if enums:
        res["enums"] = enums
    return res


def create_model_from_linkml(linkml: dict) -> MetadataModel:
    """Inverse (model_manager.py:1339-1374): classes from the class maps,
    relationships ``[label, range, alias]`` for every non-rdfs:label
    attribute, controlled terms from the enums' permissible values
    (description = '<Codelist Code>_<Term Code>')."""
    m = MetadataModel()
    for class_ in linkml.get("classes") or []:
        entry = dict(class_)
        attrs = entry.pop("attributes", [])
        label = entry["label"]
        m.create_class(
            label,
            **{k: v for k, v in entry.items()
               if k in ("short_label", "data_type", "derived", "create")},
        )
        for attr in attrs:
            if attr.get("alias") == "rdfs:label":
                continue
            m.create_relationship(label, attr["range"], attr.get("alias"))
    # '_' also being legal INSIDE codes makes '<codelist>_<term>' ambiguous;
    # split once from the left (the reference's split('_')[0]/[1] silently
    # TRUNCATES a multi-underscore term and CRASHES without one). Codelist
    # codes with underscores still won't round-trip — an inherited format
    # limitation of the reference's description encoding.
    def _codes(desc: str) -> tuple[str, str]:
        head, _, tail = (desc or "").partition("_")
        return head, tail

    ct = {
        enum_name[: -len(" CT")]: [
            {
                "rdfs:label": lbl,
                "Codelist Code": _codes(d.get("description"))[0],
                "Term Code": _codes(d.get("description"))[1],
            }
            for lbl, d in (dct.get("permissible_values") or {}).items()
        ]
        for enum_name, dct in (linkml.get("enums") or {}).items()
    }
    if ct:
        m.create_ct(ct, merge_on=["Codelist Code", "Term Code"])
    return m


# -- arrows.app JSON -----------------------------------------------------------


def load_arrows_dict(arrows: dict) -> MetadataModel:
    """arrows.app export -> metadata model: nodes with label 'Class' become
    classes; 'Term' nodes terms; relationships FROM/TO reify Relationship
    nodes, SUBCLASS_OF edges build the hierarchy (the reference persists
    methods and models in this shape)."""
    m = MetadataModel()
    node_by_id: dict[str, dict] = {n["id"]: n for n in arrows.get("nodes", [])}
    for n in arrows.get("nodes", []):
        labels = n.get("labels", [])
        props = n.get("properties", {})
        if "Class" in labels:
            m.create_class(
                props.get("label", n["id"]),
                short_label=props.get("short_label"),
                create=str(props.get("create", "")).lower() == "true",
            )
        elif "Term" in labels:
            m.add_term(
                TermSpec(
                    class_label=props.get("Class", ""),
                    codelist_code=props.get("Codelist Code", ""),
                    term_code=props.get("Term Code", ""),
                    rdfs_label=props.get("rdfs:label", ""),
                )
            )
    for r in arrows.get("relationships", []):
        frm = node_by_id.get(r["fromId"], {}).get("properties", {}).get("label")
        to = node_by_id.get(r["toId"], {}).get("properties", {}).get("label")
        rel_type = r.get("type", "")
        if not frm or not to:
            continue
        if rel_type == "SUBCLASS_OF":
            m.create_subclass(to, frm)
        else:
            m.create_relationship(frm, to, rel_type or None)
    return m


def export_arrows_dict(model: MetadataModel) -> dict:
    nodes = []
    rels = []
    ids = {}
    for i, (label, spec) in enumerate(sorted(model.classes.items())):
        nid = f"n{i}"
        ids[label] = nid
        props = {"label": label}
        if spec.short_label:
            props["short_label"] = spec.short_label
        if spec.create:
            props["create"] = "true"
        nodes.append({"id": nid, "labels": ["Class"], "properties": props})
    k = 0
    for r in model.relationships:
        if r.from_label in ids and r.to_label in ids:
            rels.append(
                {"id": f"r{k}", "fromId": ids[r.from_label], "toId": ids[r.to_label],
                 "type": r.relationship_type, "properties": {}}
            )
            k += 1
    for child, parent in model.subclass_of:
        if child in ids and parent in ids:
            rels.append(
                {"id": f"r{k}", "fromId": ids[child], "toId": ids[parent],
                 "type": "SUBCLASS_OF", "properties": {}}
            )
            k += 1
    return {"nodes": nodes, "relationships": rels}


# -- RDF / TTL -----------------------------------------------------------------

TTL_PREFIXES = """@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix t2s: <urn:tab2neo-spark:model/> .
"""


def _ttl_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _uri_frag(s: str) -> str:
    return "".join(ch if ch.isalnum() or ch in "_-" else "_" for ch in s)


def export_model_ttl(model: MetadataModel, include_terms: bool = False) -> str:
    """Deterministic Turtle export of the schema subgraph
    (model_manager.py:1090-1124 analog)."""
    lines = [TTL_PREFIXES]
    for label in sorted(model.classes):
        spec = model.classes[label]
        frag = _uri_frag(label)
        lines.append(f't2s:{frag} a owl:Class ; rdfs:label "{_ttl_escape(label)}" .')
        if spec.short_label:
            lines.append(
                f't2s:{frag} rdfs:comment "short_label={_ttl_escape(spec.short_label)}" .'
            )
    for child, parent in sorted(model.subclass_of):
        lines.append(f"t2s:{_uri_frag(child)} rdfs:subClassOf t2s:{_uri_frag(parent)} .")
    for r in sorted(model.relationships, key=lambda r: (r.from_label, r.to_label)):
        frag = _uri_frag(f"{r.from_label}_{r.relationship_type}_{r.to_label}")
        lines.append(
            f"t2s:{frag} a owl:ObjectProperty ; "
            f"rdfs:domain t2s:{_uri_frag(r.from_label)} ; "
            f"rdfs:range t2s:{_uri_frag(r.to_label)} ; "
            f'rdfs:label "{_ttl_escape(r.relationship_type)}" .'
        )
    if include_terms:
        for t in sorted(model.terms, key=lambda t: (t.codelist_code, t.term_code)):
            frag = _uri_frag(f"term_{t.codelist_code}_{t.term_code}")
            lines.append(
                f't2s:{frag} a t2s:Term ; rdfs:label "{_ttl_escape(t.rdfs_label)}" ; '
                f"t2s:inClass t2s:{_uri_frag(t.class_label)} ."
            )
    return "\n".join(lines) + "\n"


# -- Turtle parsing (method graphs; RdfDerivationMethod parity) ---------------

import re as _re

_TTL_TOKEN = _re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<uriref><[^>]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*"(?:\^\^(?:<[^>]*>|[A-Za-z][\w-]*:[\w-]+)|@[A-Za-z-]+)?)
    | (?P<punct>[;,.])
    | (?P<ws>\s+)
    | (?P<word>[^\s;,"<]+)
    """,
    _re.X,
)

_NUM_RE = _re.compile(r"^[+-]?(\d+\.\d*|\.?\d+)([eE][+-]?\d+)?$")


def _ttl_local(token: str) -> str:
    """Local name of a URI ref or prefixed name: the fragment after the
    last '#', '/' or ':' — prefix-agnostic, so the parser reads both the
    reference's neosemantics ``n4sch:`` output and this engine's ``t2sm:``
    export without a prefix table."""
    if token.startswith("<") and token.endswith(">"):
        token = token[1:-1]
    for sep in ("#", "/", ":"):
        if sep in token:
            token = token.rsplit(sep, 1)[1]
    return token


def _ttl_unescape(s: str) -> str:
    # one left-to-right pass, NOT sequential global replaces: '\\\\n'
    # (escaped backslash + n) must yield '\\n', but a '\\n'-first global
    # replace eats the second backslash and fabricates a newline
    return _re.sub(
        r"\\(.)",
        lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(m.group(1), m.group(1)),
        s,
    )


def _ttl_literal_value(tok: str):
    """Decode a literal token: quoted string with optional ^^datatype or
    @lang suffix, or a bare numeric/boolean word."""
    if tok.startswith('"'):
        m = _re.match(
            r'^"((?:[^"\\]|\\.)*)"(?:\^\^(?P<dt><[^>]*>|[A-Za-z][\w-]*:[\w-]+))?',
            tok,
        )
        body = _ttl_unescape(m.group(1))
        dt = m.group("dt")
        if dt:
            local = _ttl_local(dt).lower()
            if local in ("integer", "int", "long", "short", "byte",
                         "nonnegativeinteger", "positiveinteger"):
                return int(body)
            if local in ("double", "float", "decimal"):
                return float(body)
            if local == "boolean":
                return body == "true"
        return body
    if tok in ("true", "false"):
        return tok == "true"
    if _NUM_RE.match(tok):
        return float(tok) if any(c in tok for c in ".eE") else int(tok)
    return tok


def parse_ttl_graph(text: str) -> dict:
    """Parse a Turtle subset into the arrows.app graph-JSON shape
    (``{"nodes": [...], "relationships": [...]}``) — the common currency
    of this engine's graph (de)serializers, so TTL method specs flow
    through the same ``DerivationMethod.from_arrows_json`` path as JSON
    ones (reference: RdfDerivationMethod ingests TTL via neosemantics
    ``rdf_import_subgraph_inline`` then reads the SAME node/edge
    structure back, derivation_method/derivation_method.py:1497-1517).

    Supported grammar (what both the reference's ``n4sch:`` fixtures and
    :func:`export_model_ttl`-style output use): ``@prefix`` headers,
    ``subject pred obj (, obj)* (; pred obj...)* .`` statements, ``a`` as
    rdf:type, URI refs / prefixed names, and string literals with
    optional ``^^datatype`` / ``@lang`` (ints, floats, booleans decoded).
    URI-valued objects become relationships; literals become properties;
    multiple rdf:types become extra labels."""
    toks: list[tuple[str, str]] = []
    for m in _TTL_TOKEN.finditer(text):
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        tok = m.group()
        # legal Turtle allows the statement terminator directly after a
        # prefixed name ('x:Method.') — the greedy word class swallows it,
        # which would desynchronize the whole rest of the document; peel
        # trailing '.'s back off as punct tokens (PN_LOCAL cannot END with
        # '.', so a trailing dot is always the terminator)
        if (
            kind == "word"
            and tok.endswith(".")
            and len(tok) > 1
            and not _NUM_RE.match(tok)
        ):
            toks.append((kind, tok[:-1]))
            toks.append(("punct", "."))
            continue
        toks.append((kind, tok))

    nodes: dict[str, dict] = {}
    rels: list[dict] = []

    def node(nid: str) -> dict:
        return nodes.setdefault(
            nid,
            {"id": nid, "position": {}, "caption": "", "labels": [],
             "properties": {}},
        )

    i = 0
    while i < len(toks):
        kind, tok = toks[i]
        if kind == "word" and tok.lower() in ("@prefix", "prefix"):
            # '@prefix pn: <uri> .' — local-name extraction makes the
            # table unnecessary; just skip to the terminating '.'
            while i < len(toks) and toks[i][1] != ".":
                i += 1
            i += 1
            continue
        subj = _ttl_local(tok)
        i += 1
        while i < len(toks):
            pk, pt = toks[i]
            if pt == ".":
                i += 1
                break
            if pt == ";":
                i += 1
                continue
            # rdf:type is the BARE keyword 'a' or the full rdf-ns URI —
            # decided on the raw token, never the localized name (a
            # property legitimately NAMED 'a', e.g. t2sm:a, must stay a
            # property)
            is_type = (pk == "word" and pt == "a") or (
                pk == "uriref"
                and pt[1:-1] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
            )
            pred = _ttl_local(pt)
            i += 1
            while i < len(toks):
                ok, ot = toks[i]
                i += 1
                if is_type:
                    node(subj)["labels"].append(_ttl_local(ot))
                elif ok == "uriref" or (
                    ok == "word" and ":" in ot and not _NUM_RE.match(ot)
                    and ot not in ("true", "false")
                ):
                    rels.append(
                        {"id": f"r{len(rels)}", "fromId": subj,
                         "toId": _ttl_local(ot), "type": pred,
                         "properties": {}, "style": {}}
                    )
                    node(subj)
                else:
                    node(subj)["properties"][pred] = _ttl_literal_value(ot)
                if i < len(toks) and toks[i][1] == ",":
                    i += 1
                    continue
                break
    # edge endpoints referenced but never declared still need node stubs
    for r in rels:
        node(r["toId"])
    return {"nodes": list(nodes.values()), "relationships": rels, "style": {}}
