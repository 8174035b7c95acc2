#!/usr/bin/env python
"""Streamlit front-end for the inference service.

Capability parity with /root/reference/streamlit_demo.py:1-138: search and
add-documents tabs talking to the FastAPI service's /search and /add
endpoints, with a health indicator. Gated on streamlit being installed.

Run:  streamlit run streamlit_demo.py
Env:  API_URL (default http://localhost:8080)
"""

import os

import requests

try:
    import streamlit as st
except ImportError as exc:  # pragma: no cover - depends on environment
    raise SystemExit(f"streamlit is not installed: {exc}")

API_URL = os.environ.get("API_URL", "http://localhost:8080")

st.set_page_config(page_title="Two-Tower Search", page_icon="🔎")
st.title("Two-Tower Retrieval Demo")

try:
    health = requests.get(f"{API_URL}/health", timeout=5).json()
    status = health.get("status", "unknown")
    st.caption(
        f"service: **{status}** · model loaded: {health.get('model_loaded')} · "
        f"documents: {health.get('documents', 0)}"
    )
except Exception as exc:
    st.error(f"Cannot reach the inference service at {API_URL}: {exc}")
    st.stop()

search_tab, add_tab = st.tabs(["Search", "Add documents"])

with search_tab:
    query = st.text_input("Query", placeholder="what is a tensor processing unit")
    top_k = st.slider("Results", 1, 20, 5)
    if st.button("Search", type="primary") and query:
        with st.spinner("Searching..."):
            response = requests.post(
                f"{API_URL}/search", json={"query": query, "top_k": top_k},
                timeout=30,
            )
        if response.ok:
            results = response.json()["results"]
            if not results:
                st.info("No documents indexed yet — add some in the other tab.")
            for rank, hit in enumerate(results, 1):
                similarity = 1.0 - hit["distance"]
                with st.container(border=True):
                    st.markdown(f"**{rank}.** {hit['document']}")
                    st.caption(f"similarity {similarity:.4f} · id `{hit['id']}`")
        else:
            st.error(f"Search failed: {response.status_code} {response.text}")

with add_tab:
    docs_text = st.text_area(
        "Documents (one per line)",
        placeholder="paste documents here, one per line",
        height=200,
    )
    if st.button("Add to index") and docs_text.strip():
        documents = [line.strip() for line in docs_text.splitlines() if line.strip()]
        with st.spinner(f"Encoding {len(documents)} documents..."):
            response = requests.post(
                f"{API_URL}/add", json={"documents": documents}, timeout=120,
            )
        if response.ok:
            payload = response.json()
            st.success(
                f"Added {payload['added']} documents "
                f"(collection now has {payload['total']})."
            )
        else:
            st.error(f"Add failed: {response.status_code} {response.text}")
