"""RDF vocabulary constants (the namespaces the reference binds by
default, documentrepository.py:288-304: rdf, dcterms, bibo, prov, foaf,
owl, schema)."""

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

DCTERMS = "http://purl.org/dc/terms/"
DCTERMS_TITLE = DCTERMS + "title"
DCTERMS_IDENTIFIER = DCTERMS + "identifier"
DCTERMS_PUBLISHER = DCTERMS + "publisher"
DCTERMS_ISSUED = DCTERMS + "issued"
DCTERMS_SUBJECT = DCTERMS + "subject"
DCTERMS_REFERENCES = DCTERMS + "references"
DCTERMS_ISPARTOF = DCTERMS + "isPartOf"

BIBO_DOCUMENT = "http://purl.org/ontology/bibo/Document"
BIBO_DOCUMENTPART = "http://purl.org/ontology/bibo/DocumentPart"
BIBO_CHAPTER = "http://purl.org/ontology/bibo/chapter"

PROV_WASGENERATEDBY = "http://www.w3.org/ns/prov#wasGeneratedBy"
FOAF_PAGE = "http://xmlns.com/foaf/0.1/page"
FOAF_NAME = "http://xmlns.com/foaf/0.1/name"
SCHEMA_MENTIONS = "http://schema.org/mentions"

XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"

GENERATOR_ID = "ferenda_spark.WebPageRepo"

# qname-style short forms used for facet column names
# (g.qname(x).replace(':','_') semantics, documentrepository.py:2256-2260)
QNAMES = {
    RDF_TYPE: "rdf_type",
    DCTERMS_TITLE: "dcterms_title",
    DCTERMS_IDENTIFIER: "dcterms_identifier",
    DCTERMS_PUBLISHER: "dcterms_publisher",
    DCTERMS_ISSUED: "dcterms_issued",
    DCTERMS_SUBJECT: "dcterms_subject",
}
