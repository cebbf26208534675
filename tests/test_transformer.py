"""T10 Transformer: the XSLT-subset engine (functions/xslt.py) and the
mapInPandas generate stage (operators/transformer.py) — the reference's
``Transformer.transform`` applied to render_xhtml output
[ref: ferenda/transformer.py]."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from ferenda_spark.functions.xslt import XsltError, compile_stylesheet, transform
from ferenda_spark.operators.parse import parse_stage, split_parsed
from ferenda_spark.operators.transformer import (
    GENERIC_XSL,
    generate_html,
    transform_xml,
)
from ferenda_spark.operators.xhtml import render_xhtml
from ferenda_spark.sources.corpus import generate_corpus

XSL = 'xmlns:xsl="http://www.w3.org/1999/XSL/Transform"'


def sheet(body: str):
    return compile_stylesheet(
        f'<xsl:stylesheet version="1.0" {XSL}>{body}</xsl:stylesheet>'
    )


CATALOG = (
    '<catalog><book year="2003" lang="en"><t>Zeta</t><price>30</price></book>'
    '<book year="1999" lang="sv"><t>Alpha</t><price>12</price></book>'
    '<book year="2010" lang="en"><t>Mid</t><price>21</price></book></catalog>'
)


class TestEngine:
    def test_for_each_sort_positions_predicates(self):
        s = sheet(
            '<xsl:template match="/"><r total="{count(catalog/book)}">'
            '<xsl:for-each select="catalog/book"><xsl:sort select="t"/>'
            '<b p="{position()}"><xsl:value-of select="t"/></b></xsl:for-each>'
            "<en><xsl:value-of select='count(catalog/book[@lang=\"en\"])'/></en>"
            "<second><xsl:value-of select='catalog/book[2]/t'/></second>"
            "<cheap><xsl:value-of select='count(catalog/book[price &lt; 25])'/></cheap>"
            "</r></xsl:template>"
        )
        assert transform(s, CATALOG) == (
            '<r total="3"><b p="1">Alpha</b><b p="2">Mid</b><b p="3">Zeta</b>'
            "<en>2</en><second>Alpha</second><cheap>2</cheap></r>"
        )

    def test_numeric_descending_and_multikey_sort(self):
        doc = '<c><b g="x" n="2"/><b g="y" n="1"/><b g="x" n="1"/><b g="y" n="3"/></c>'
        s = sheet(
            '<xsl:template match="/"><o><xsl:for-each select="c/b">'
            '<xsl:sort select="@g" order="descending"/>'
            '<xsl:sort select="@n" data-type="number"/>'
            '<i><xsl:value-of select="concat(@g, @n)"/></i>'
            "</xsl:for-each></o></xsl:template>"
        )
        assert transform(s, doc) == "<o><i>y1</i><i>y3</i><i>x1</i><i>x2</i></o>"

    def test_template_rules_priority_and_builtin(self):
        # book[@lang='en'] (prio 0.5) beats book (prio 0); built-in rules
        # recurse elements and copy text; empty template suppresses price
        s = sheet(
            '<xsl:template match="book[@lang=\'en\']"><en>'
            '<xsl:apply-templates select="t"/></en></xsl:template>'
            '<xsl:template match="price"/>'
        )
        assert transform(s, CATALOG) == "<en>Zeta</en>Alpha<en>Mid</en>"

    def test_choose_variable_copy_of_element_attribute(self):
        s = sheet(
            '<xsl:template match="/"><out>'
            '<xsl:variable name="n" select="count(catalog/book)"/>'
            '<xsl:choose><xsl:when test="$n > 5"><many/></xsl:when>'
            '<xsl:otherwise><few n="{$n}"/></xsl:otherwise></xsl:choose>'
            "<xsl:copy-of select=\"catalog/book[@lang='sv']\"/>"
            '<xsl:element name="dyn-{catalog/book[1]/@year}">'
            '<xsl:attribute name="a">v&amp;1</xsl:attribute>x</xsl:element>'
            "</out></xsl:template>"
        )
        assert transform(s, CATALOG) == (
            '<out><few n="3"/><book year="1999" lang="sv"><t>Alpha</t>'
            '<price>12</price></book><dyn-2003 a="v&amp;1">x</dyn-2003></out>'
        )

    def test_descendant_axis_union_and_string_functions(self):
        s = sheet(
            '<xsl:template match="/"><o'
            ' deep="{count(//t)}"'
            ' u="{count(catalog/book/t | catalog/book/price)}"'
            ' sub="{substring-after(string(catalog/book[1]/@year), \'20\')}"'
            ' ns="{normalize-space(\'  a  b \')}"'
            ' sw="{starts-with(catalog/book[1]/t, \'Ze\')}"/></xsl:template>'
        )
        assert transform(s, CATALOG) == (
            '<o deep="3" u="6" sub="03" ns="a b" sw="true"/>'
        )

    def test_params_modes_and_text_escaping(self):
        s = compile_stylesheet(
            f'<xsl:stylesheet version="1.0" {XSL}>'
            '<xsl:param name="who"/>'
            '<xsl:template match="/"><g>'
            '<xsl:value-of select="$who"/>'
            '<xsl:apply-templates select="catalog/book[1]/t" mode="loud"/>'
            "</g></xsl:template>"
            '<xsl:template match="t" mode="loud"><L><xsl:value-of select="."/></L>'
            "</xsl:template></xsl:stylesheet>"
        )
        out = transform(s, CATALOG, params={"who": "a<b&c"})
        assert out == "<g>a&lt;b&amp;c<L>Zeta</L></g>"

    def test_unsupported_constructs_raise(self):
        with pytest.raises(XsltError):
            sheet('<xsl:key name="k" match="b" use="@i"/>')
        with pytest.raises(XsltError):
            sheet('<xsl:template match="/"><xsl:number/></xsl:template>')
        with pytest.raises(XsltError):
            transform(sheet('<xsl:template match="/"><a/></xsl:template>'), "<bad")

    def test_local_name_matching_over_namespaces(self):
        doc = '<h:r xmlns:h="urn:x"><h:i a="1">t</h:i></h:r>'
        s = sheet(
            '<xsl:template match="i"><got a="{@a}"><xsl:value-of select="."/>'
            "</got></xsl:template>"
        )
        assert transform(s, doc) == '<got a="1">t</got>'


class TestGenerateStage:
    def test_generic_xsl_over_rendered_corpus(self, spark):
        docs, _ = split_parsed(
            parse_stage(generate_corpus(spark, 24), n_parts=4, with_sections=True)
        )
        xhtml = render_xhtml(docs)
        rows = generate_html(xhtml).collect()
        assert len(rows) == 24
        assert all(r["transform_error"] is None for r in rows)
        xhtml_by_url = {r["url"]: r["xhtml"] for r in xhtml.collect()}
        for r in rows:
            html = r["html"]
            root = ET.fromstring(html)  # well-formed output
            assert root.tag == "html"
            parsed = ET.fromstring(xhtml_by_url[r["url"]])
            ns = "{http://www.w3.org/1999/xhtml}"
            title = parsed.find(f"{ns}head/{ns}title").text or ""
            assert (root.find("head/title").text or "") == title
            # nav has one entry per TOP-LEVEL section, hrefs match ids
            secs = parsed.find(f"{ns}body").findall(f"{ns}section")
            nav_links = root.findall("body/nav/ul/li/a")
            assert len(nav_links) == len(secs)
            ids = {
                d.attrib["id"]
                for d in root.iter("div")
                if d.attrib.get("class") == "section"
            }
            for a in nav_links:
                assert a.attrib["href"].lstrip("#") in ids
            # every unlinked mention became <em class="mention">
            n_spans = sum(1 for _ in parsed.iter(f"{ns}span"))
            n_ems = sum(
                1
                for e in root.iter("em")
                if e.attrib.get("class") == "mention"
            )
            assert n_spans == n_ems
            # resolved citations stay links with their hrefs
            hrefs_in = {
                a.attrib["href"] for a in parsed.iter(f"{ns}a")
            }
            hrefs_out = {
                a.attrib["href"]
                for a in root.iter("a")
                if a.attrib.get("class") == "ref"
            }
            assert hrefs_in == hrefs_out

    def test_annotations_param_column(self, spark):
        docs, _ = split_parsed(
            parse_stage(generate_corpus(spark, 4), n_parts=2, with_sections=True)
        )
        from pyspark.sql import functions as F

        xhtml = render_xhtml(docs).withColumn(
            "annotations", F.concat(F.lit("notes for "), F.col("url"))
        )
        rows = generate_html(xhtml).collect()
        for r in rows:
            assert f"notes for {r['url']}" in r["html"]

    def test_errors_as_data_not_job_failure(self, spark):
        df = spark.createDataFrame(
            [("ok", "<html><head><title>t</title></head><body/></html>"),
             ("broken", "<html><unclosed")],
            "basefile string, xhtml string",
        )
        rows = {r["basefile"]: r for r in generate_html(df).collect()}
        assert rows["ok"]["transform_error"] is None
        assert rows["broken"]["html"] is None
        assert "well-formed" in rows["broken"]["transform_error"]

    def test_bad_stylesheet_fails_on_driver(self, spark):
        df = spark.createDataFrame([("a", "<r/>")], "basefile string, xhtml string")
        with pytest.raises(XsltError):
            transform_xml(df, "<xsl:bogus/>")

    def test_stable_deterministic_output(self, spark):
        docs, _ = split_parsed(
            parse_stage(generate_corpus(spark, 8), n_parts=2, with_sections=True)
        )
        xhtml = render_xhtml(docs)
        a = {r["url"]: r["html"] for r in generate_html(xhtml).collect()}
        b = {r["url"]: r["html"] for r in generate_html(xhtml).collect()}
        assert a == b
